"""Unit tests for the static-permutation gather and the trace summarizer."""

import struct

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu.bench import trace
from volym_tpu.ops.slab_kernel import _perm_gather


def test_perm_gather_forward_and_vjp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    order = rng.permutation(12)

    ref = lambda x: jnp.take(x, jnp.asarray(order), axis=0)
    ours = lambda x: _perm_gather(x, order, axis=0)
    np.testing.assert_array_equal(np.asarray(ours(x)), np.asarray(ref(x)))

    ct = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    _, vjp_ref = jax.vjp(ref, x)
    _, vjp_ours = jax.vjp(ours, x)
    np.testing.assert_allclose(
        np.asarray(vjp_ours(ct)[0]), np.asarray(vjp_ref(ct)[0]), atol=0
    )


def test_perm_gather_axis1():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    order = rng.permutation(8)
    out = _perm_gather(x, order, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, order])
    g = jax.grad(lambda x: jnp.sum(_perm_gather(x, order, axis=1) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(x[:, order] ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=0)


# ---- trace.py: build a tiny XSpace by hand and parse it -------------------


def _tag(fnum, wt):
    return bytes([(fnum << 3) | wt])


def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(fnum, payload):
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _vi(fnum, v):
    return _tag(fnum, 0) + _varint(v)


def test_trace_parser_roundtrip(tmp_path):
    # XEventMetadata {id=1: varint, name=2: string}
    emeta = _vi(1, 7) + _ld(2, b"matmul.1")
    # map entry {key=1, value=2}
    entry = _vi(1, 7) + _ld(2, emeta)
    # XEvent {metadata_id=1, duration_ps=3}: 2.5 ms = 2.5e9 ps
    ev = _vi(1, 7) + _vi(3, 2_500_000_000)
    # XLine {name=2, events=4}
    line = _ld(2, b"step") + _ld(4, ev) + _ld(4, ev)
    # XPlane {name=2, lines=3, event_metadata=4}
    plane = _ld(2, b"/device:TPU:0") + _ld(3, line) + _ld(4, entry)
    space = _ld(1, plane)

    p = tmp_path / "x" / "test.xplane.pb"
    p.parent.mkdir()
    p.write_bytes(space)

    planes = trace.parse_xspace(str(p))
    assert len(planes) == 1
    assert planes[0].name == "/device:TPU:0"
    (name, t, c), = planes[0].top()
    assert name == "matmul.1" and c == 2
    np.testing.assert_allclose(t, 5e-3, rtol=1e-9)

    table = trace.device_op_table(str(tmp_path))
    assert "matmul.1" in table and "/device:TPU:0" in table
