"""List-form limb arithmetic: the same 18x15-bit lazy-carry field math as
ops/field.py, but operating on PYTHON LISTS of same-shaped arrays (one
array per limb) instead of a stacked (L, *batch) array.

Why a second form: Pallas TPU kernels want pure elementwise ops on tiled
blocks - jnp.pad/concatenate/stack along the limb axis (which the stacked
form uses everywhere) lower poorly or not at all inside kernels.  With one
array per limb, every operation below is a plain elementwise mul/add/shift
on identically-shaped tiles, which Mosaic compiles to clean VPU code.  The
functions work on any array type supporting numpy-style arithmetic (jnp
arrays under jit, Pallas refs' loaded values, even numpy for tests).

The algorithms and bounds mirror ops/field.py exactly (15-bit limbs,
2^255 = -2c fold, borrow-free K-b subtraction); see the bounds comments
there.  Cross-validated against ops/field.py and the int oracle in
tests/test_pallas.py.
"""

from __future__ import annotations

import numpy as np

from halo_accumulation_tpu.ops.field import Field, L, W

_U15 = np.uint32(0x7FFF)
_W = np.uint32(W)


def _zero_like(x):
    return x - x  # dtype/shape-preserving zero without jnp imports


def mul_cols(a: list, b: list) -> list:
    """Schoolbook columns with per-product lazy split: 18x18 products,
    each split into (lo & 15bit) + carry.  Column bound: <= 72 * 2^15 <
    2^22, no u32 overflow.  Returns 37 columns."""
    na, nb = len(a), len(b)
    cols = [None] * (na + nb + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(na):
        ai = a[i]
        for j in range(nb):
            p = ai * b[j]
            acc(i + j, p & _U15)
            acc(i + j + 1, p >> _W)
    z = _zero_like(a[0])
    return [c if c is not None else z for c in cols]


def mul_const_cols(const_limbs: list[int], b: list) -> list:
    """(python-int constant digits) * (nearly clean limb list)."""
    nc, nb = len(const_limbs), len(b)
    cols = [None] * (nc + nb + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i, ci in enumerate(const_limbs):
        if ci == 0:
            continue
        cu = np.uint32(ci)
        for j in range(nb):
            p = b[j] * cu
            acc(i + j, p & _U15)
            acc(i + j + 1, p >> _W)
    z = _zero_like(b[0])
    return [c if c is not None else z for c in cols]


def carry_pass(cols: list, n_out: int | None = None) -> list:
    """One vectorized carry pass: out_i = (x_i & M) + (x_{i-1} >> 15)."""
    n = len(cols)
    out = []
    for i in range(n + 1):
        lo = (cols[i] & _U15) if i < n else None
        hi = (cols[i - 1] >> _W) if i > 0 else None
        if lo is None:
            out.append(hi)
        elif hi is None:
            out.append(lo)
        else:
            out.append(lo + hi)
    if n_out is not None:
        out = out[:n_out]
    return out


def carry_pass2(cols: list, n_out: int | None = None) -> list:
    return carry_pass(carry_pass(cols), n_out)


class ListField:
    """List-form twin of ops/field.Field (same constants, same bounds)."""

    def __init__(self, f: Field):
        self.f = f

    def _const_minus(self, kdigits: list[int], b: list) -> list:
        out = []
        for i, kd in enumerate(kdigits):
            if i < len(b):
                out.append(np.uint32(kd) - b[i])
            else:
                # materialize the constant at the right shape/dtype
                out.append(_zero_like(b[0]) + np.uint32(kd))
        return out

    def _fold_tail(self, x: list) -> list:
        """x: 18..20 nearly clean limbs, value < 2^273 -> GOOD 18 limbs."""
        low = x[:17]
        high = x[17:]
        X = carry_pass2(mul_const_cols(self.f.c2_limbs, high), 12)
        d = self._const_minus(self.f.k12, X)  # 18 limbs
        s = [low[i] + d[i] for i in range(17)] + [d[17]]
        return carry_pass(s, 18)

    def _reduce_wide(self, t: list) -> list:
        """Full reduction of nearly clean columns (<= 38 limbs, value
        < 2^527) -> GOOD 18 limbs.  Mirrors field.Field._reduce_wide."""
        low0 = t[:17]
        h0 = t[17:]
        X1 = carry_pass2(mul_const_cols(self.f.c2_limbs, h0))
        low1 = X1[:17]
        h1 = X1[17:]
        X2 = carry_pass2(mul_const_cols(self.f.c2_limbs, h1), 20)
        low2 = X2[:17]
        h2 = X2[17:20]
        X3 = carry_pass2(mul_const_cols(self.f.c2_limbs, h2), 12)
        pos = [low0[i] + low2[i] for i in range(17)]
        neg = [low1[i] if i < 17 else _zero_like(t[0]) for i in range(18)]
        for i in range(len(X3)):
            neg[i] = neg[i] + X3[i]
        d = self._const_minus(self.f.k18, neg)  # 20 limbs
        s = [pos[i] + d[i] for i in range(17)] + d[17:20]
        r = carry_pass(s, 20)
        return self._fold_tail(r)

    # -- public ops (inputs nearly clean GOOD lists of 18) -------------------

    def mul(self, a: list, b: list) -> list:
        return self._reduce_wide(carry_pass2(mul_cols(a, b)))

    def sqr(self, a: list) -> list:
        return self.mul(a, a)

    def add(self, a: list, b: list) -> list:
        return carry_pass([a[i] + b[i] for i in range(L)], L)

    def sub(self, a: list, b: list) -> list:
        d = self._const_minus(self.f.k18, b)  # 20 limbs
        s = [a[i] + d[i] for i in range(L)] + d[L:]
        return self._fold_tail(carry_pass(s, 20))

    def mul_small(self, a: list, k: int) -> list:
        ku = np.uint32(k)
        return self._fold_tail(carry_pass2([x * ku for x in a]))


def padd_list(F: ListField, P1, P2):
    """Complete projective add (RCB16 alg 7, a=0, b3=15) on limb lists.
    P = (x, y, z) tuples of 18-limb lists.  Mirrors ops/curve.padd."""
    x1, y1, z1 = P1
    x2, y2, z2 = P2
    t0 = F.mul(x1, x2)
    t1 = F.mul(y1, y2)
    t2 = F.mul(z1, z2)
    t3 = F.sub(F.mul(F.add(x1, y1), F.add(x2, y2)), F.add(t0, t1))
    t4 = F.sub(F.mul(F.add(y1, z1), F.add(y2, z2)), F.add(t1, t2))
    w = F.sub(F.mul(F.add(x1, z1), F.add(x2, z2)), F.add(t0, t2))
    t2b = F.mul_small(t2, 15)
    wb = F.mul_small(w, 15)
    t0b = F.add(F.add(t0, t0), t0)
    z3s = F.add(t1, t2b)
    t1b = F.sub(t1, t2b)
    x3 = F.sub(F.mul(t3, t1b), F.mul(t4, wb))
    y3 = F.add(F.mul(t1b, z3s), F.mul(wb, t0b))
    z3 = F.add(F.mul(z3s, t4), F.mul(t0b, t3))
    return (x3, y3, z3)


def pdbl_list(F: ListField, P):
    """Complete projective double (RCB16 alg 9, a=0), mirrors curve.pdbl."""
    x, y, z = P
    t0 = F.mul(y, y)
    t1 = F.mul(y, z)
    zz = F.mul(z, z)
    t2 = F.mul_small(zz, 15)
    z38 = F.mul_small(t0, 8)
    y3s = F.add(t0, t2)
    t0a = F.sub(t0, F.mul_small(t2, 3))
    x3a = F.mul(t2, z38)
    z3 = F.mul(t1, z38)
    xy = F.mul(x, y)
    y3b = F.mul(t0a, y3s)
    x3b = F.mul(t0a, xy)
    y3 = F.add(x3a, y3b)
    x3 = F.add(x3b, x3b)
    return (x3, y3, z3)
