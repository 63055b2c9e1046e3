import numpy as np
import pytest

from evo_tpu.tokenizer import CharLevelTokenizer

pytestmark = pytest.mark.smoke


def test_tokenize_is_utf8_bytes():
    tok = CharLevelTokenizer(512)
    ids = tok.tokenize('ACGT')
    assert ids.dtype == np.int32
    assert list(ids) == [65, 67, 71, 84]


def test_special_ids():
    tok = CharLevelTokenizer(512)
    assert tok.eod_id == 0
    assert tok.eos_id == 0
    assert tok.pad_id == 1
    assert tok.vocab_size == 512


def test_roundtrip():
    tok = CharLevelTokenizer(512)
    s = 'ACGTNacgtn'
    assert tok.detokenize(tok.tokenize(s)) == s


def test_detokenize_clamps_below_32():
    tok = CharLevelTokenizer(512)
    # ids < 32 (e.g. pad=1, eos=0) clamp to chr(32) = ' '
    assert tok.detokenize([0, 1, 65]) == '  A'


def test_detokenize_batch():
    tok = CharLevelTokenizer(512)
    batch = np.array([[65, 67], [71, 84]])
    assert tok.detokenize_batch(batch) == ['AC', 'GT']
