"""Chat prompt templates.

Behavioral reference: /root/reference/modeling/conversation.py (FastChat-
derived). The reference defines 17 separator styles but registers only
MPT-style templates (Hermes-2, internlm2-chat, phi3-chat, internvl2_5 —
conversation.py:340-391); we implement the styles those templates exercise
plus CHATML, and the same registry API (get_conv_template returns a copy).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    MPT = "mpt"
    CHATML = "chatml"
    ADD_COLON_SINGLE = "add_colon_single"
    NO_COLON_SINGLE = "no_colon_single"


@dataclasses.dataclass
class Conversation:
    name: str
    system_template: str = "{system_message}"
    system_message: str = ""
    roles: Tuple[str, str] = ("USER", "ASSISTANT")
    messages: List[List[Optional[str]]] = dataclasses.field(default_factory=list)
    sep_style: SeparatorStyle = SeparatorStyle.MPT
    sep: str = "\n"
    sep2: Optional[str] = None
    stop_str: Optional[str] = None

    def get_prompt(self) -> str:
        system_prompt = self.system_template.format(
            system_message=self.system_message)
        if self.sep_style == SeparatorStyle.MPT:
            # conversation.py:240-249
            ret = system_prompt + self.sep
            for role, message in self.messages:
                ret += role + message + self.sep if message else role
            return ret
        if self.sep_style == SeparatorStyle.CHATML:
            ret = "" if system_prompt == "" else system_prompt + self.sep + "\n"
            for role, message in self.messages:
                if message:
                    ret += role + "\n" + message + self.sep + "\n"
                else:
                    ret += role + "\n"
            return ret
        if self.sep_style == SeparatorStyle.ADD_COLON_SINGLE:
            ret = system_prompt + self.sep
            for role, message in self.messages:
                ret += role + (": " + message + self.sep if message else ":")
            return ret
        if self.sep_style == SeparatorStyle.NO_COLON_SINGLE:
            ret = system_prompt
            for role, message in self.messages:
                ret += role + message + self.sep if message else role
            return ret
        raise ValueError(f"unsupported separator style {self.sep_style}")

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def update_last_message(self, message: str) -> None:
        self.messages[-1][1] = message

    def copy(self) -> "Conversation":
        return Conversation(
            name=self.name, system_template=self.system_template,
            system_message=self.system_message, roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            sep_style=self.sep_style, sep=self.sep, sep2=self.sep2,
            stop_str=self.stop_str)


conv_templates: Dict[str, Conversation] = {}


def register_conv_template(template: Conversation,
                           override: bool = False) -> None:
    if not override and template.name in conv_templates:
        raise ValueError(f"{template.name} already registered")
    conv_templates[template.name] = template


def get_conv_template(name: str) -> Conversation:
    return conv_templates[name].copy()


_INTERNVL_SYSTEM = ("你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，"
                    "英文名叫InternVL, 是一个有用无害的人工智能助手。")

register_conv_template(Conversation(
    name="Hermes-2",
    system_template="<|im_start|>system\n{system_message}",
    system_message=_INTERNVL_SYSTEM,
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
    stop_str="<|endoftext|>",
))

register_conv_template(Conversation(
    name="internlm2-chat",
    system_template="<|im_start|>system\n{system_message}",
    system_message=_INTERNVL_SYSTEM,
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
))

register_conv_template(Conversation(
    name="phi3-chat",
    system_template="<|system|>\n{system_message}",
    system_message=_INTERNVL_SYSTEM,
    roles=("<|user|>\n", "<|assistant|>\n"),
    sep_style=SeparatorStyle.MPT,
    sep="<|end|>",
))

register_conv_template(Conversation(
    name="internvl2_5",
    system_template="<|im_start|>system\n{system_message}",
    system_message=("你是书生·万象，英文名是InternVL，是由上海人工智能实验室、"
                    "清华大学及多家合作单位联合开发的多模态大语言模型。"),
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>\n",
))


def build_chat_prompt(template_name: str, question: str,
                      history: Optional[List[Tuple[str, str]]] = None,
                      system_message: Optional[str] = None,
                      num_image_token: int = 1024,
                      num_patches_list: Optional[List[int]] = None,
                      img_start_token: str = "<img>",
                      img_end_token: str = "</img>",
                      img_context_token: str = "<IMG_CONTEXT>",
                      has_image: bool = True) -> str:
    """Assemble the full chat prompt with expanded image tokens.

    Mirrors InternVLSAMModel.chat prompt assembly
    (modeling_internvl_sam.py:276-304): append '\n<image>' to a first-turn
    question lacking it, then expand each '<image>' into
    <img> + <IMG_CONTEXT>*num_image_token*num_patches + </img>.
    """
    if has_image and not history and "<image>" not in question:
        question = question + "\n<image>"
    template = get_conv_template(template_name)
    if system_message is not None:
        template.system_message = system_message
    for old_q, old_a in (history or []):
        template.append_message(template.roles[0], old_q)
        template.append_message(template.roles[1], old_a)
    template.append_message(template.roles[0], question)
    template.append_message(template.roles[1], None)
    query = template.get_prompt()
    for num_patches in (num_patches_list or ([1] if has_image else [])):
        image_tokens = (img_start_token
                        + img_context_token * (num_image_token * num_patches)
                        + img_end_token)
        query = query.replace("<image>", image_tokens, 1)
    return query
