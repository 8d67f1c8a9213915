"""Host data pipeline: jsonl datasets + fixed-shape numpy batching.

Behavioral reference: MultimodalPretrainDataset / MultimodalSFTDataset /
MultimodalSegDataset (train_joint_v2.py:50-600). Differences by design:
  * fixed-shape outputs (pad-to-max everywhere) so the jit train step never
    recompiles; variable instance counts padded + instance_valid mask
  * per-process sharding by index stride replaces DistributedSampler
  * the assistant-marker token triple is derived from the tokenizer rather
    than hardcoded (the reference hardcodes 92543/525/11353, :132-145)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from ullsam_tpu.models.ullsam.conversation import get_conv_template
from ullsam_tpu.data.point_sampling import sample_instance_points
from ullsam_tpu.data.tokenizer import (IMG_CONTEXT_TOKEN, IMG_END_TOKEN,
                                       IMG_START_TOKEN)


def load_image_rgb(path: str, img_size: int) -> np.ndarray:
    """[img_size, img_size, 3] float32 in [0,1] (the uLLSAM training path
    feeds [0,1] tensors — Normalize(mean=0, std=1), train_joint_v2.py:75-79)."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((img_size, img_size))
    return np.asarray(img, np.float32) / 255.0


@dataclasses.dataclass
class DatasetConfig:
    data_path: str
    images_root: Optional[str] = None
    max_length: int = 1280
    img_size: int = 1024
    num_image_token: int = 1024
    template: str = "internlm2-chat"
    # seg-only
    num_pos_points: int = 1
    num_neg_points: int = 3
    sam_max_point_bs: int = 4


class _JsonlDataset:
    """Base: jsonl rows with an image path; skips missing files
    (train_joint_v2.py:82-91)."""

    image_key = "image"
    conv_key = "conversations"

    def __init__(self, cfg: DatasetConfig, tokenizer):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rows = []
        with open(cfg.data_path, "r", encoding="utf-8") as f:
            for line in f:
                item = json.loads(line.strip())
                path = item.get(self.image_key) or item.get("image_path")
                if cfg.images_root:
                    path = os.path.join(cfg.images_root, path)
                if not os.path.exists(path):
                    continue
                item["image_path"] = path
                self.rows.append(item)
        # assistant marker ids derived from the tokenizer
        marker = tokenizer.encode("<|im_start|>assistant", add_bos=False)
        self.assistant_marker = marker
        self.img_context_token_id = tokenizer.convert_tokens_to_ids(
            IMG_CONTEXT_TOKEN)

    def __len__(self):
        return len(self.rows)

    # -- prompt/label construction ---------------------------------------

    def _build_prompt(self, conversation: List[dict]) -> str:
        t = get_conv_template(self.cfg.template)
        image_tokens = (IMG_START_TOKEN
                        + IMG_CONTEXT_TOKEN * self.cfg.num_image_token
                        + IMG_END_TOKEN)
        for msg in conversation:
            role, content = msg["role"], msg["content"]
            if role == "user" and "<image>" in content:
                content = content.replace("<image>", image_tokens)
            t.append_message(t.roles[0 if role == "user" else 1], content)
        return t.get_prompt()

    def _tokenize(self, prompt: str):
        ids = self.tokenizer.encode(prompt)[: self.cfg.max_length]
        attn = [1] * len(ids)
        pad = self.cfg.max_length - len(ids)
        ids = ids + [self.tokenizer.pad_token_id] * pad
        attn = attn + [0] * pad
        ids = np.asarray(ids, np.int32)
        attn = np.asarray(attn, np.int32)

        # labels: -100 before the first assistant turn (and on padding)
        labels = ids.copy().astype(np.int32)
        m = self.assistant_marker
        first = None
        for i in range(len(ids) - len(m) + 1):
            if list(ids[i:i + len(m)]) == m:
                first = i
                break
        if first is None:
            labels[:] = -100
        else:
            labels[:first] = -100
        labels[attn == 0] = -100
        labels[ids == self.img_context_token_id] = -100
        return ids, attn, labels

    def example(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.rows[idx]
        conv = item.get(self.conv_key) or item.get("conversation")
        ids, attn, labels = self._tokenize(self._build_prompt(conv))
        pixel = load_image_rgb(item["image_path"], self.cfg.img_size)
        return {"input_ids": ids, "attention_mask": attn, "labels": labels,
                "pixel_values": pixel}


class PretrainDataset(_JsonlDataset):
    """jsonl {image, conversations[]} (train_joint_v2.py:50-158)."""

    image_key = "image"
    conv_key = "conversations"


class SFTDataset(_JsonlDataset):
    """jsonl {image_path, conversation[]} (train_joint_v2.py:160-250)."""

    image_key = "image_path"
    conv_key = "conversation"


class SegDataset(_JsonlDataset):
    """SFT rows + instance masks at image path with images->masks
    (train_joint_v2.py:252-600). Adds padded point prompts + GT masks."""

    image_key = "image_path"
    conv_key = "conversation"

    def example(self, idx: int, seed: Optional[int] = None
                ) -> Dict[str, np.ndarray]:
        base = super().example(idx)
        cfg = self.cfg
        rng = np.random.default_rng(seed if seed is not None else idx)

        item = self.rows[idx]
        mask_path = item.get("mask_path") or item["image_path"].replace(
            "images", "masks")

        I = cfg.sam_max_point_bs
        P = cfg.num_pos_points + cfg.num_neg_points
        S = cfg.img_size
        masks = np.zeros((I, S, S), np.float32)
        coords = np.zeros((I, P, 2), np.float32)
        plabels = np.zeros((I, P), np.int32)
        valid = np.zeros((I,), np.float32)

        if os.path.exists(mask_path):
            from PIL import Image

            m = Image.open(mask_path).convert("I")
            m = m.resize((S, S), Image.NEAREST)
            m = np.asarray(m)
            ids = np.unique(m)
            ids = ids[ids > 0]
            if len(ids) > 0:
                n = min(len(ids), I)
                chosen = rng.choice(ids, n, replace=False)
                for j, inst in enumerate(chosen):
                    inst_mask = m == inst
                    pts, labs = sample_instance_points(
                        inst_mask, rng, num_pos=cfg.num_pos_points,
                        num_neg=cfg.num_neg_points)
                    masks[j] = inst_mask.astype(np.float32)
                    coords[j] = pts
                    plabels[j] = labs
                    valid[j] = 1.0

        base.update({"masks": masks, "point_coords": coords,
                     "point_labels": plabels, "instance_valid": valid})
        return base


def batch_iterator_sharded(dataset, batch_size: int, *, shuffle: bool = True,
                           seed: int = 0, process_index: int = 0,
                           process_count: int = 1, drop_last: bool = True,
                           epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Per-process sharded batches (replaces DistributedSampler,
    train_joint_v2.py:1711)."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    order = order[process_index::process_count]
    usable = (len(order) // batch_size) * batch_size if drop_last else len(order)
    for start in range(0, usable, batch_size):
        idxs = order[start:start + batch_size]
        examples = [dataset.example(int(i)) for i in idxs]
        yield {k: np.stack([e[k] for e in examples]) for k in examples[0]}


class PrefetchIterator:
    """Background-thread prefetch over a batch iterator (the reference's
    DataLoader(num_workers=4) analog: host point-sampling/image IO overlaps
    with device steps)."""

    def __init__(self, iterable, prefetch: int = 2, num_threads: int = 2):
        import queue as _q
        import threading

        self._queue: "_q.Queue" = _q.Queue(maxsize=prefetch)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except Exception as e:  # surfaced on next()
                self._err = e
            finally:
                self._queue.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def pack_examples(examples: List[Dict[str, np.ndarray]], max_length: int,
                  pad_token_id: int) -> Dict[str, np.ndarray]:
    """Pack tokenized examples into one [1, max_length] row with segment
    ids (1..k, 0 = pad) — the varlen replacement for one-doc-per-row
    padding batches. Returns input_ids/segment_ids/labels [1, S] plus
    pixel_values [k, ...] stacked in token-stream order (fusion_forward
    packed mode). Examples must jointly fit max_length (caller packs
    greedily)."""
    ids = np.full((max_length,), pad_token_id, np.int32)
    seg = np.zeros((max_length,), np.int32)
    lab = np.full((max_length,), -100, np.int32)
    pixels = []
    off = 0
    for s, e in enumerate(examples, start=1):
        n = int(e["attention_mask"].sum())
        assert off + n <= max_length, "examples overflow max_length"
        ids[off:off + n] = e["input_ids"][:n]
        seg[off:off + n] = s
        lab[off:off + n] = e["labels"][:n]
        if "pixel_values" in e:
            pixels.append(e["pixel_values"])
        off += n
    out = {"input_ids": ids[None], "segment_ids": seg[None],
           "labels": lab[None]}
    if pixels:
        out["pixel_values"] = np.stack(pixels)
    return out


def packed_batch_iterator_sharded(dataset, rows_per_batch: int,
                                  max_length: int, pad_token_id: int, *,
                                  docs_per_row: int = 2,
                                  shuffle: bool = True, seed: int = 0,
                                  process_index: int = 0,
                                  process_count: int = 1,
                                  epoch: int = 0
                                  ) -> Iterator[Dict[str, np.ndarray]]:
    """Pack EXACTLY `docs_per_row` samples into each row (fixed shapes —
    a variable per-row image count would retrace the jitted step every
    batch). A sample that would overflow max_length is dropped. Yields
    batches of `rows_per_batch` packed rows; pixel_values carries the
    images of all rows' samples concatenated in row-major order (the
    order scatter_image_embeds consumes them)."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    order = order[process_index::process_count]

    rows, cur, cur_len, dropped = [], [], 0, 0
    pending = []  # deferred samples that overflowed a partially-filled row
    idx_iter = iter(order)
    while True:
        # A pending sample fits max_length alone, so it's always safe to
        # start a fresh row with; retry pending first whenever cur is empty.
        if pending and not cur:
            e = pending.pop(0)
        else:
            i = next(idx_iter, None)
            if i is None:
                if pending and not cur:
                    continue  # drain remaining pending into fresh rows
                break
            e = dataset.example(int(i))
        ln = int(e["attention_mask"].sum())
        if ln > max_length:
            dropped += 1  # genuinely oversized: can never fit any row
            continue
        if cur_len + ln > max_length:
            # Doesn't fit the current partially-filled row — defer it for
            # a fresh row instead of dropping it.
            pending.append(e)
            continue
        cur.append(e)
        cur_len += ln
        if len(cur) == docs_per_row:
            rows.append(cur)
            cur, cur_len = [], 0
        if len(rows) == rows_per_batch:
            packed = [pack_examples(r, max_length, pad_token_id)
                      for r in rows]
            batch = {k: np.concatenate([p[k] for p in packed])
                     for k in ("input_ids", "segment_ids", "labels")}
            pix = [p["pixel_values"] for p in packed if "pixel_values" in p]
            if pix:
                batch["pixel_values"] = np.concatenate(pix)
            yield batch
            rows = []
    if dropped:  # no silent caps: surface what the packer skipped
        print(f"[pack] dropped {dropped} samples that overflowed "
              f"max_length={max_length}")
