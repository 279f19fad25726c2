"""Checked-in golden fixtures: decoding the committed GGUF must reproduce
the committed fp32 arrays bit-exactly (SURVEY.md §4 golden-value tests).

Guards against silent codec regressions that a same-process
quantize→dequantize round trip cannot catch (a symmetric bug cancels).
Regenerate (only on a deliberate format-behavior change) with the script
in the fixture's ``golden.note`` provenance field.
"""

import os

import numpy as np
import pytest

from comfyui_gguf_tpu.gguf.reader import GGUFReader
from comfyui_gguf_tpu.quant import codecs

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GGUF = os.path.join(GOLDEN_DIR, "codecs_v1.gguf")
NPZ = os.path.join(GOLDEN_DIR, "codecs_v1_expected.npz")


@pytest.fixture(scope="module")
def golden():
    return GGUFReader(GGUF), np.load(NPZ)


def test_all_qtypes_present(golden):
    reader, expected = golden
    names = {t.name for t in reader.tensors}
    assert names == set(expected.files)
    assert len(names) == 15


@pytest.mark.parametrize("use_native", [False, True])
def test_decode_matches_golden(golden, use_native):
    reader, expected = golden
    if use_native:
        from comfyui_gguf_tpu import native

        if native.get_lib() is None:
            pytest.skip("native codec library not built")
    for t in reader.tensors:
        got = codecs.dequantize(t.data, t.qtype, t.shape,
                                use_native=use_native)
        np.testing.assert_array_equal(
            got, expected[t.name],
            err_msg=f"{t.name} ({t.qtype.name}) decode drifted",
        )
