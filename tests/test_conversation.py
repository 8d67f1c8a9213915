"""Prompt-string equality vs reference conversation templates."""

from ullsam_tpu.models.ullsam.conversation import (build_chat_prompt,
                                                   get_conv_template)


def _prompt(name, question, history=None):
    t = get_conv_template(name)
    for q, a in (history or []):
        t.append_message(t.roles[0], q)
        t.append_message(t.roles[1], a)
    t.append_message(t.roles[0], question)
    t.append_message(t.roles[1], None)
    return t.get_prompt()


def test_prompt_strings_match_reference(goldens):
    g = goldens("conversation")
    assert _prompt("internlm2-chat", "Describe the image.\n<image>") == \
        str(g["internlm2_simple"])
    assert _prompt("internlm2-chat", "And now?",
                   history=[("Hi", "Hello!")]) == str(g["internlm2_history"])
    assert _prompt("Hermes-2", "What is this?\n<image>") == str(g["hermes"])
    assert _prompt("phi3-chat", "Segment the cell.\n<image>") == str(g["phi3"])
    assert _prompt("internvl2_5", "Caption.\n<image>") == str(g["internvl25"])


def test_build_chat_prompt_image_expansion():
    p = build_chat_prompt("internlm2-chat", "What is this?",
                          num_image_token=4)
    assert "<img>" + "<IMG_CONTEXT>" * 4 + "</img>" in p
    assert "<image>" not in p
    assert p.endswith("<|im_start|>assistant\n")
    # appended '\n<image>' first-turn behavior
    assert "What is this?\n<img>" in p


def test_copy_isolation():
    a = get_conv_template("internlm2-chat")
    a.append_message(a.roles[0], "x")
    b = get_conv_template("internlm2-chat")
    assert b.messages == []


def test_all_separator_styles_match_reference_goldens():
    """Every style x scenario from tools/make_conversation_goldens.py,
    pinned against the reference's get_prompt output
    (/root/reference/modeling/conversation.py:63-251)."""
    import json
    import pathlib

    from ullsam_tpu.models.ullsam.conversation import (Conversation,
                                                       SeparatorStyle)

    gold = json.loads((pathlib.Path(__file__).parent / "goldens" /
                       "conversation_styles.json").read_text())
    base_roles = ("USER", "ASSISTANT")
    chat = [["USER", "hi there"], ["ASSISTANT", "hello!"],
            ["USER", "tell me more"], ["ASSISTANT", None]]
    single = [["USER", "only question"], ["ASSISTANT", None]]
    messy = [["USER", "line1\r\nline2\n\nline3"], ["ASSISTANT", None]]
    scenarios = [
        ("full", dict(name="t", system_template="SYS: {system_message}",
                      system_message="be helpful", roles=base_roles,
                      sep="\n", sep2="</s>"), chat),
        ("nosys", dict(name="t", system_template="{system_message}",
                       system_message="", roles=base_roles,
                       sep="\n", sep2="</s>"), single),
        ("messy", dict(name="t", system_template="{system_message}",
                       system_message="sys", roles=base_roles,
                       sep=" ", sep2="<e>"), messy),
        ("glm2", dict(name="chatglm2", system_template="{system_message}",
                      system_message="sys", roles=("问", "答"),
                      sep="\n", sep2="</s>"), chat),
    ]
    checked = 0
    for style in SeparatorStyle:
        for scen_name, kw, messages in scenarios:
            conv = Conversation(messages=[list(m) for m in messages],
                                sep_style=style, **kw)
            key = f"{style.name}/{scen_name}"
            assert conv.get_prompt() == gold[key], key
            checked += 1
    assert checked == len(gold) == 72  # 18 styles x 4 scenarios


def test_mpt_tuple_message_and_openai_export():
    from ullsam_tpu.models.ullsam.conversation import (Conversation,
                                                       SeparatorStyle)

    conv = Conversation(name="t", system_message="s",
                        roles=("u:", "a:"),
                        sep_style=SeparatorStyle.MPT, sep="|")
    # rich (text, image, ...) messages collapse to their text part
    # (reference conversation.py:243-245)
    conv.messages = [["u:", ("look", None, None)], ["a:", None]]
    assert conv.get_prompt() == "s|u:look|a:"
    conv2 = Conversation(name="t", system_message="sys")
    conv2.messages = [["USER", "q1"], ["ASSISTANT", "a1"],
                      ["USER", "q2"], ["ASSISTANT", None]]
    msgs = conv2.to_openai_api_messages()
    assert msgs == [{"role": "system", "content": "sys"},
                    {"role": "user", "content": "q1"},
                    {"role": "assistant", "content": "a1"},
                    {"role": "user", "content": "q2"}]
