"""Field kernels vs the pure-Python int oracle.

Mirrors the reference's randomized-property test style (e.g.
/root/reference/code/src/pedersen.rs:30-63) but targets the limb arithmetic
layer the reference gets for free from arkworks."""

import numpy as np
import pytest

from halo_accumulation_tpu.ops.field import FQ, FR, L
from halo_accumulation_tpu.runtime import cached_jit


def rand_elems(rng, f, n, lazy=False):
    """Random canonical ints; if lazy, sample the full lazy range (values
    up to ~2^257, the GOOD bound of the 15-bit limb representation)."""
    hi = (1 << 257) if lazy else f.p
    return [int.from_bytes(rng.bytes(40), "little") % hi for _ in range(n)]


def from_raw(f, vs):
    """Load possibly-non-canonical lazy values without reduction."""
    import jax.numpy as jnp

    arr = np.zeros((L, len(vs)), np.uint32)
    for j, v in enumerate(vs):
        for i in range(L):
            arr[i, j] = (v >> (15 * i)) & 0x7FFF
    return jnp.asarray(arr)


EDGE = lambda p: [0, 1, 2, p - 1, p - 2, p // 2, 2 * p - 1, p, p + 1, (1 << 254) - 1, 1 << 254, (1 << 255) + 5, (1 << 257) - 1]


@pytest.mark.parametrize("f", [FQ, FR], ids=["Fq", "Fr"])
def test_roundtrip(rng, f):
    vs = rand_elems(rng, f, 17)
    back = f.to_ints(f.from_ints(vs))
    assert [int(x) for x in back] == vs


@pytest.mark.parametrize("f", [FQ, FR], ids=["Fq", "Fr"])
@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg", "sqr"])
def test_binary_ops_vs_oracle(rng, f, op):
    n = 64
    a_int = rand_elems(rng, f, n, lazy=True) + EDGE(f.p)
    b_int = rand_elems(rng, f, n, lazy=True) + list(reversed(EDGE(f.p)))
    n = len(a_int)
    a, b = from_raw(f, a_int), from_raw(f, b_int)
    fn = cached_jit(getattr(f, op), f.name)
    if op == "add":
        got, want = fn(a, b), [(x + y) % f.p for x, y in zip(a_int, b_int)]
    elif op == "sub":
        got, want = fn(a, b), [(x - y) % f.p for x, y in zip(a_int, b_int)]
    elif op == "mul":
        got, want = fn(a, b), [(x * y) % f.p for x, y in zip(a_int, b_int)]
    elif op == "neg":
        got, want = fn(a), [(-x) % f.p for x in a_int]
    else:
        got, want = fn(a), [(x * x) % f.p for x in a_int]
    got_ints = [int(x) for x in f.to_ints(got)]
    assert got_ints == want
    # lazy-representation invariant: raw stored value stays in bounds
    raw = np.asarray(got).astype(object)
    bound = (1 << 258) if op != "add" else (1 << 258)
    for j in range(raw.shape[1]):
        v = sum(int(raw[i, j]) << (15 * i) for i in range(L))
        assert v < bound, (op, j)
        assert v % f.p == want[j]


@pytest.mark.parametrize("f", [FQ, FR], ids=["Fq", "Fr"])
def test_mul_small(rng, f):
    vs = rand_elems(rng, f, 16, lazy=True)
    a = from_raw(f, vs)
    for k in (2, 3, 8, 15, 4095):
        got = [int(x) for x in f.to_ints(cached_jit(f.mul_small, f.name, k, static_argnums=1)(a, k))]
        assert got == [v * k % f.p for v in vs]


@pytest.mark.parametrize("f", [FQ, FR], ids=["Fq", "Fr"])
def test_inv(rng, f):
    vs = rand_elems(rng, f, 13) + [1, f.p - 1, 0]
    a = f.from_ints(vs)
    got = [int(x) for x in f.to_ints(cached_jit(f.inv, f.name)(a))]
    want = [pow(v, -1, f.p) if v else 0 for v in vs]
    assert got == want


@pytest.mark.parametrize("f", [FQ, FR], ids=["Fq", "Fr"])
def test_pow_sum_eq(rng, f):
    vs = rand_elems(rng, f, 8)
    a = f.from_ints(vs)
    e = 0xDEADBEEF12345678
    got = [int(x) for x in f.to_ints(cached_jit(f.pow_const, f.name, e, static_argnums=1)(a, e))]
    assert got == [pow(v, e, f.p) for v in vs]
    s = int(f.to_ints(cached_jit(f.sum_along, f.name, static_argnums=1)(a, 0)))
    assert s == sum(vs) % f.p
    eqf = cached_jit(f.eq, f.name)
    assert bool(eqf(a, a).all())
    addf = cached_jit(f.add, f.name)
    assert not bool(eqf(a, addf(a, f.from_int(1, a.shape[1:]))).any())
    subf = cached_jit(f.sub, f.name)
    assert bool(cached_jit(f.is_zero, f.name)(subf(a, a)).all())
