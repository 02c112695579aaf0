"""Polynomial kernels: powers/eval vs oracle; tensor h expansion structure
(mirrors pcdl.rs:352-379 `test_test` and :486-509 h-coefficients test)."""


from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.ops import poly as poly_mod
from halo_accumulation_tpu.ops.field import FR
from halo_accumulation_tpu.runtime import cached_jit


def rand_fr(rng, n):
    return [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]


def test_powers_and_eval(rng):
    n = 37
    z = rand_fr(rng, 1)[0]
    zl = FR.from_ints([z])[:, 0]
    pw = cached_jit(poly_mod.powers, n, static_argnums=1)(zl, n)
    got = [int(x) for x in FR.to_ints(pw)]
    want, cur = [], 1
    for _ in range(n):
        want.append(cur)
        cur = cur * z % F.R
    assert got == want

    coeffs = rand_fr(rng, n)
    ev = cached_jit(poly_mod.eval_poly, n)(FR.from_ints(coeffs), zl)
    assert int(FR.to_ints(ev)) == sum(c * w for c, w in zip(coeffs, want)) % F.R


def test_tensor_h_structure(rng):
    """h coeffs == [1, x3, x2, x2x3, x1, x1x3, x1x2, x1x2x3] for lg n = 3
    (pcdl.rs:486-509)."""
    xis = rand_fr(rng, 4)
    hc = cached_jit(poly_mod.tensor_h_coeffs, 4)(FR.from_ints(xis))
    got = [int(x) for x in FR.to_ints(hc)]
    x1, x2, x3 = xis[1], xis[2], xis[3]
    want = [1, x3, x2, x2 * x3, x1, x1 * x3, x1 * x2, x1 * x2 * x3]
    assert got == [w % F.R for w in want]


def test_h_eval_log_vs_dense(rng):
    """HPoly log-time eval == dense-coefficient eval (pcdl.rs:352-379)."""
    for lg_n in (2, 5, 8):
        xis = rand_fr(rng, lg_n + 1)
        z = rand_fr(rng, 1)[0]
        v1 = poly_mod.h_eval_host(xis, z, F.R)
        hc = cached_jit(poly_mod.tensor_h_coeffs, lg_n + 1)(FR.from_ints(xis))
        coeffs = [int(x) for x in FR.to_ints(hc)]
        zp, v2 = 1, 0
        for c in coeffs:
            v2 = (v2 + c * zp) % F.R
            zp = zp * z % F.R
        assert v1 == v2


def test_mul_by_linear(rng):
    from halo_accumulation_tpu.pcdl import _mul_by_linear

    k = 9
    q = rand_fr(rng, k)
    z = rand_fr(rng, 1)[0]
    zl = FR.from_ints([z])[:, 0]
    got = [int(x) for x in FR.to_ints(cached_jit(_mul_by_linear, k)(FR.from_ints(q), zl))]
    # (X - z) * q: coeff i = q_{i-1} - z q_i
    want = [(-z * q[0]) % F.R]
    for i in range(1, k):
        want.append((q[i - 1] - z * q[i]) % F.R)
    want.append(q[k - 1] % F.R)
    assert got == want
    # p_bar(z) == 0
    zp, ev = 1, 0
    for c in got:
        ev = (ev + c * zp) % F.R
        zp = zp * z % F.R
    assert ev == 0
