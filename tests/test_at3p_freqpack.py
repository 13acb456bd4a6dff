"""Tone-frequency bit-pack golden cases (fast tier).

Pins `create_freq_bit_pack` to the reference's asc/desc edge cases
(at3p_bitstream_ut.cpp:8-111).  The on-device formulation is covered
transitively: tests/test_at3p_device_pack.py asserts whole-frame byte
identity against this host packer.
"""
from atracdenc_tpu.models.atrac3p.frame import create_freq_bit_pack

ASC, DESC = 0, 1


def test_single_wave():
    fields, order = create_freq_bit_pack([1])
    assert order == ASC
    assert fields == [(1, 10)]


def test_asc_with_high_band_deltas():
    fields, order = create_freq_bit_pack([512, 1020, 1023])
    assert order == ASC
    assert fields == [(512, 10), (508, 9), (3, 2)]
    assert sum(b for _, b in fields) == 21


def test_desc_cheaper_for_low_freqs():
    fields, order = create_freq_bit_pack([1, 2, 3])
    assert order == DESC
    assert fields == [(3, 10), (2, 2), (1, 2)]
    assert sum(b for _, b in fields) == 14


def test_desc_mixed_ends():
    fields, order = create_freq_bit_pack([1, 2, 3, 1020, 1021, 1022])
    assert order == DESC
    assert fields == [(1022, 10), (1021, 10), (1020, 10),
                      (3, 10), (2, 2), (1, 2)]
    assert sum(b for _, b in fields) == 44


def test_asc_wins_when_strictly_cheaper():
    fields, order = create_freq_bit_pack([1, 2, 1020, 1021, 1022])
    assert order == ASC
    assert fields == [(1, 10), (2, 10), (1020, 10), (1, 2), (2, 2)]
    assert sum(b for _, b in fields) == 34
