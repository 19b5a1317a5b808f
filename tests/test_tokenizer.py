"""CLIP BPE tokenizer golden tests.

Golden ids are the canonical OpenAI CLIP SimpleTokenizer outputs (widely
published; e.g. "a photo of a cat" -> [49406, 320, 1125, 539, 320, 2368,
49407]). The reference uses the same tokenizer (model/tokenizer.py:75-162).
"""

import numpy as np

from helping_hand_for_egocentric_videos_tpu.data.tokenizer import (
    ClipTokenizer,
    CONTEXT_LENGTH,
    VOCAB_SIZE,
)

tok = ClipTokenizer()


def test_golden_cat():
    ids = tok("a photo of a cat")[0]
    np.testing.assert_array_equal(
        ids[:7], [49406, 320, 1125, 539, 320, 2368, 49407]
    )
    assert (ids[7:] == 0).all()


def test_batch_shape_and_dtype():
    out = tok(["a", "b", "c"])
    assert out.shape == (3, CONTEXT_LENGTH)
    assert out.dtype == np.int32


def test_sot_eot_and_vocab_range():
    ids = tok("#C C opens a drawer")[0]
    assert ids[0] == 49406  # <|startoftext|>
    eot_pos = int(np.argmax(ids))  # EOT is the max id — the backbone's
    assert ids[eot_pos] == 49407  # EOT-lookup trick (model/LaviLa.py:669)
    assert ids.max() < VOCAB_SIZE


def test_empty_string_two_tokens():
    # Empty rephrased captions tokenize to exactly [SOT, EOT]; the training
    # loop detects padding rows via "!= 2 nonzero tokens" (run/train.py:144).
    ids = tok("")[0]
    assert (ids != 0).sum() == 2
    np.testing.assert_array_equal(ids[:2], [49406, 49407])


def test_truncation():
    ids = tok("x " * 500)[0]
    assert ids.shape == (CONTEXT_LENGTH,)
    assert (ids != 0).all()


def test_roundtrip_decode():
    ids = tok("open the fridge door")[0]
    n = int((ids != 0).sum())
    text = tok.decode(ids[1 : n - 1]).strip()
    assert text == "open the fridge door"


def test_case_and_whitespace_insensitive():
    a = tok("  Open   THE Fridge ")[0]
    b = tok("open the fridge")[0]
    np.testing.assert_array_equal(a, b)
