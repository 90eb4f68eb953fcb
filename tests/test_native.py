"""Native TSV engine (C++ via ctypes) — skipped when g++ is unavailable."""

import base64

import numpy as np
import pytest

from lighthand_tpu.data.native import (
    native_available,
    native_b64_decode,
    native_generate_lineidx,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine not built")


def test_native_lineidx_matches_python(tmp_path):
    rows = ["k%d\tv%d" % (i, i * 7) for i in range(100)]
    tsv = tmp_path / "x.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    idx_native = tmp_path / "native.lineidx"
    assert native_generate_lineidx(str(tsv), str(idx_native))

    # python oracle
    offsets, pos = [], 0
    for r in rows:
        offsets.append(pos)
        pos += len(r) + 1
    got = [int(x) for x in idx_native.read_text().split()]
    assert got == offsets


def test_native_b64_roundtrip(rng):
    payload = rng.integers(0, 255, size=1000, dtype=np.uint8).tobytes()
    enc = base64.b64encode(payload).decode()
    dec = native_b64_decode(enc)
    assert dec is not None
    assert dec.tobytes() == payload


def test_native_b64_rejects_garbage():
    assert native_b64_decode("!!!not-base64!!!") is None
