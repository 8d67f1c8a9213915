"""Generate string goldens for EVERY reference separator style.

Runs the reference's own Conversation.get_prompt
(/root/reference/modeling/conversation.py:63-251 — pure string code, no
torch needed) over a fixed scenario matrix and writes the resulting
prompts to tests/goldens/conversation_styles.json. Tests then compare
ullsam_tpu.models.ullsam.conversation against the checked-in goldens
without needing the reference mounted.

Usage: python tools/make_conversation_goldens.py
"""

import importlib.util
import json
import pathlib

REF = pathlib.Path("/root/reference/modeling/conversation.py")
OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "goldens" / \
    "conversation_styles.json"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_conversation", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# scenario matrix: (scenario_name, kwargs-without-style, messages)
# messages use role slot 0/1 alternating; None marks a generation slot.
def scenarios():
    base_roles = ("USER", "ASSISTANT")
    chat = [["USER", "hi there"], ["ASSISTANT", "hello!"],
            ["USER", "tell me more"], ["ASSISTANT", None]]
    single = [["USER", "only question"], ["ASSISTANT", None]]
    messy = [["USER", "line1\r\nline2\n\nline3"], ["ASSISTANT", None]]
    yield ("full", dict(name="t", system_template="SYS: {system_message}",
                        system_message="be helpful", roles=base_roles,
                        sep="\n", sep2="</s>"), chat)
    yield ("nosys", dict(name="t", system_template="{system_message}",
                         system_message="", roles=base_roles,
                         sep="\n", sep2="</s>"), single)
    yield ("messy", dict(name="t", system_template="{system_message}",
                         system_message="sys", roles=base_roles,
                         sep=" ", sep2="<e>"), messy)
    # chatglm2 numbers rounds from 1 — pin the name-dependent branch
    yield ("glm2", dict(name="chatglm2", system_template="{system_message}",
                        system_message="sys", roles=("问", "答"),
                        sep="\n", sep2="</s>"), chat)


def main():
    ref = _load_ref()
    out = {}
    for style in ref.SeparatorStyle:
        for scen_name, kw, messages in scenarios():
            conv = ref.Conversation(
                messages=[list(m) for m in messages],
                sep_style=style, **kw)
            key = f"{style.name}/{scen_name}"
            out[key] = conv.get_prompt()
    OUT.write_text(json.dumps(out, ensure_ascii=False, indent=1))
    print(f"wrote {len(out)} goldens -> {OUT}")


if __name__ == "__main__":
    main()
