"""Hint-text generation, tokenization and flip-rewrites.

The hint template, tokenizer rules (lowercase, strip ``.``/``,``, whitespace
split) and the east↔west / north↔south flip rewriting match the reference:
 - template:   /root/reference/dataloading/kitti360pose/base.py:57-66
 - tokenizer:  /root/reference/models/modules.py:59-66
 - flips:      /root/reference/dataloading/kitti360pose/utils.py:13-86
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from text2pos_tpu.data.structs import Cell, Pose


def create_hint_description(pose: Pose, cell: Cell = None) -> List[str]:
    """One sentence per description: "The pose is {dir} of a {color} {label}."."""
    return [
        f"The pose is {d.direction} of a {d.object_color_text} {d.object_label}."
        for d in pose.descriptions
    ]


def tokenize(text: str) -> List[str]:
    return text.replace(".", "").replace(",", "").lower().split()


def build_vocabulary(hint_lists: Sequence[Sequence[str]]) -> List[str]:
    """Unique sorted word list over all hints (reference base.py:71-76)."""
    words: List[str] = []
    for hints in hint_lists:
        for hint in hints:
            words.extend(tokenize(hint))
    return list(np.unique(words))


class Vocabulary:
    """Word → index map with ``<unk>`` = 0 (reference modules.py:44-46).

    Index 0 doubles as the padding index; its embedding row is pinned to
    zero by the language encoder.
    """

    def __init__(self, known_words: Sequence[str]):
        self.known_words = [str(w) for w in known_words]
        self.word_to_index: Dict[str, int] = {w: i + 1 for i, w in enumerate(known_words)}
        self.word_to_index["<unk>"] = 0
        self.size = len(self.word_to_index)

    def encode(self, text: str, max_len: int) -> Tuple[np.ndarray, int]:
        """Token ids [max_len] (0-padded/truncated) and the true length."""
        ids = [self.word_to_index.get(w, 0) for w in tokenize(text)]
        length = min(len(ids), max_len)
        out = np.zeros(max_len, dtype=np.int32)
        out[:length] = ids[:length]
        return out, length

    def encode_batch(self, texts: Sequence[str], max_len: int) -> Tuple[np.ndarray, np.ndarray]:
        tokens = np.zeros((len(texts), max_len), dtype=np.int32)
        lengths = np.zeros(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            tokens[i], lengths[i] = self.encode(t, max_len)
        return tokens, lengths


def flip_text(text: str, direction: int) -> str:
    """Rewrite direction words for a horizontal (+1) or vertical (-1) flip."""
    assert direction in (-1, 1)
    if direction == 1:
        out = (
            text.replace("east", "east-flipped")
            .replace("west", "east")
            .replace("east-flipped", "west")
        )
    else:
        out = (
            text.replace("north", "north-flipped")
            .replace("south", "north")
            .replace("north-flipped", "south")
        )
    assert "flipped" not in out
    return out


def flip_pose_in_cell(pose: Pose, cell: Cell, text: str, direction: int,
                      hints: List[str] = None, offsets: np.ndarray = None):
    """Flip a (pose, cell, text[, hints, offsets]) tuple along one axis.

    Copies inputs before modifying, mirroring reference
    dataloading/kitti360pose/utils.py:13-86.
    """
    assert direction in (-1, 1)
    assert (hints is None) == (offsets is None)

    import copy

    pose = copy.deepcopy(pose)
    cell = copy.deepcopy(cell)
    if offsets is not None:
        offsets = offsets.copy()

    axis = 0 if direction == 1 else 1
    pose.pose[axis] = 1.0 - pose.pose[axis]
    for obj in cell.objects:
        obj.xyz[:, axis] = 1.0 - obj.xyz[:, axis]
    for descr in pose.descriptions:
        descr.closest_point[axis] = 1.0 - descr.closest_point[axis]

    text = flip_text(text, direction)
    if hints is not None:
        hints = [flip_text(h, direction) for h in hints]
        offsets[:, axis] *= -1

    if hints is not None:
        return pose, cell, text, hints, offsets
    return pose, cell, text
