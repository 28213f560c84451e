"""Tokenizer parity with the reference CLIP BPE (imported from the read-only
reference tree with an ftfy stub — task prompts are ASCII so fix_text is an
identity there)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from uni_encoder_tpu.data.tokenizer import CLIPTokenizer, Tokenize, tokenize_task

REF = "/root/reference/model/data/tokenizer.py"

PROMPTS = [
    "The task is panoptic",
    "The task is semantic",
    "The task is instance",
    "a photo with a car",
    "a semantic photo",
    "an instance photo of 3 traffic lights!",
    "Ünïcode, accents — and punctuation...",
]


def _load_reference():
    pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference tree not available")
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_tokenizer", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_encode_matches_reference():
    ref = _load_reference()
    ref_tok = ref.SimpleTokenizer()
    ours = CLIPTokenizer()
    for p in PROMPTS:
        assert ours.encode(p) == ref_tok.encode(p), p


def test_fixed_length_tokenize_matches_reference():
    ref = _load_reference()
    ref_wrap = ref.Tokenize(ref.SimpleTokenizer(), max_seq_len=77)
    ours = Tokenize(CLIPTokenizer(), max_seq_len=77)
    for p in PROMPTS[:3]:
        np.testing.assert_array_equal(ours(p), ref_wrap(p).numpy())


def test_task_cache():
    ids = tokenize_task("The task is panoptic")
    assert len(ids) == 77
    assert ids[0] == 49406  # <|startoftext|>
    assert 49407 in ids  # <|endoftext|>


def test_roundtrip_decode():
    tok = CLIPTokenizer()
    ids = tok.encode("the task is panoptic")
    assert tok.decode(ids).strip() == "the task is panoptic"
