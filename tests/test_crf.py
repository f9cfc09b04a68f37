"""CRF-Viterbi decode layer: brute-force equality + BIO-validity property."""
import numpy as np
import pytest

from bionext_ray.crf import (brute_force_decode, impossible_transition_masks,
                             viterbi_decode)


def _bio_valid(seq, n_classes):
    """True iff no I tag follows anything but its own B/I (and no leading I)."""
    prev = None
    for tag in seq:
        if tag != 0 and tag % 2 == 0:          # an I tag, class c
            c = (tag - 2) // 2
            if prev not in (2 * c + 1, 2 * c + 2):
                return False
        prev = tag
    return True


def test_viterbi_equals_brute_force_small_windows():
    # n_classes=2 -> 5 tags; L=4 -> 625 paths per draw
    rng = np.random.default_rng(11)
    for _ in range(20):
        em = rng.normal(size=(4, 5))
        trans = rng.normal(size=(5, 5)) * 0.3
        start = rng.normal(size=5) * 0.3
        end = rng.normal(size=5) * 0.3
        got = viterbi_decode(em[None], transitions=trans,
                             start_transitions=start, end_transitions=end)[0]
        want = brute_force_decode(em, transitions=trans,
                                  start_transitions=start,
                                  end_transitions=end)
        assert got.tolist() == want.tolist()


def test_viterbi_equals_brute_force_zero_transitions():
    # zero learned scores: Viterbi is exactly the mask-constrained argmax
    rng = np.random.default_rng(5)
    for _ in range(10):
        em = rng.normal(size=(5, 5)) * 3
        got = viterbi_decode(em[None])[0]
        want = brute_force_decode(em)
        assert got.tolist() == want.tolist()


def test_viterbi_respects_attention_mask():
    rng = np.random.default_rng(3)
    em = rng.normal(size=(2, 6, 13))
    mask = np.array([[1, 1, 1, 1, 0, 0],
                     [1, 1, 1, 1, 1, 1]])
    out = viterbi_decode(em, mask)
    # padded positions come back as O and the valid prefix matches the
    # decode of the truncated sequence
    assert out[0, 4:].tolist() == [0, 0]
    solo = viterbi_decode(em[0:1, :4])[0]
    assert out[0, :4].tolist() == solo.tolist()


def test_viterbi_bio_validity_property_vs_argmax():
    # random logits over the real 13-tag layout: argmax emits invalid BIO
    # sequences; Viterbi under the impossible-transition mask never does
    rng = np.random.default_rng(42)
    argmax_invalid = 0
    for _ in range(50):
        em = rng.normal(size=(8, 24, 13))
        mask = np.ones((8, 24), dtype=np.int64)
        mask[:, rng.integers(12, 24):] = 0
        mask[:, 0] = 1
        dec = viterbi_decode(em, mask)
        for b in range(8):
            L = int(mask[b].sum())
            assert _bio_valid(dec[b, :L].tolist(), 6)
            if not _bio_valid(em[b, :L].argmax(-1).tolist(), 6):
                argmax_invalid += 1
    # the property is only interesting if raw argmax actually violates it
    assert argmax_invalid > 0


def test_impossible_transition_mask_shape():
    s, t = impossible_transition_masks(6)
    assert s.shape == (13,) and t.shape == (13, 13)
    # start: every I forbidden, O and every B allowed
    assert s.sum() == 6 and not s[0] and not s[1::2].any()
    # O->I all forbidden; I-i -> I-i allowed; B-i -> I-i allowed
    assert all(t[0, 2 * i + 2] for i in range(6))
    assert not any(t[2 * i + 1, 2 * i + 2] for i in range(6))
    assert not any(t[2 * i + 2, 2 * i + 2] for i in range(6))


def test_viterbi_requires_valid_first_step():
    em = np.zeros((1, 3, 5))
    mask = np.array([[0, 1, 1]])
    with pytest.raises(ValueError):
        viterbi_decode(em, mask)
