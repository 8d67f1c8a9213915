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
