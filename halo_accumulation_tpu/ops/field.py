"""Vectorized 255-bit prime-field arithmetic for the Pasta fields, in JAX.

TPU-native design (no counterpart in the Rust reference, which delegates to
arkworks' 4x64-bit Montgomery code - /root/reference/code/Cargo.toml ark-ff):

  * A field element is 18 limbs of 15 bits stored as uint32, limb-major:
    an array of shape (18, *batch).  15-bit limbs buy two crucial things:
      - bit 255 falls exactly on the limb-17 boundary, and the Pasta primes
        satisfy 2^255 = -2c (mod p) with c = p - 2^254 < 2^126, so
        reduction is a *limb-aligned* fold by the small constant 2c - no
        bit-exact splitting, no Montgomery form, no data-dependent control
        flow;
      - limbs may stay "nearly clean" (<= 2^15 + eps): products of two such
        limbs still fit uint32, so carries are resolved with two vectorized
        shift-mask passes over the whole limb plane instead of a
        sequential per-limb ripple.  This keeps HLO graphs small (a full
        modular multiply is a few hundred fused VPU ops) and the compiled
        code branch-free.
  * Lazy bounds: stored values satisfy value < 2^257 ("GOOD"); add/sub
    produce slightly larger values whose bounds are documented per-op and
    always re-enter GOOD through the next multiply or an explicit fold.
    Only canon() (serialization, comparison, digit extraction) runs an
    exact carry ripple + conditional subtract ladder.
  * Subtraction is borrow-free: a - b = a + (K - b) where K is a
    precomputed multiple of p whose 15-bit digits all dominate any nearly
    clean limb; the enlarged value is folded straight back down.

All public functions operate on stacked uint32 arrays with the limb axis
first and are safe to call under jit/vmap/shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

L = 18  # number of limbs
W = 15  # bits per limb
MASK = np.uint32(0x7FFF)
U32 = jnp.uint32

# max value of a "nearly clean" limb after the standard two carry passes
_NEAR = 0x8008
# per-digit domination constant for borrow-free K - b (covers limb sums of
# two nearly-clean values plus slack)
_DOM = 0x1FFFF


def int_to_limbs(v: int, n: int = L) -> list[int]:
    """Python int -> list of n 15-bit limb ints (little-endian)."""
    assert 0 <= v < (1 << (W * n))
    return [(v >> (W * i)) & 0x7FFF for i in range(n)]


def limbs_to_int(limbs) -> int:
    v = 0
    for i, l in enumerate(limbs):
        v += int(l) << (W * i)
    return v


def _pass(cols, n_out: int | None = None):
    """One vectorized carry pass: out_i = (x_i & M) + (x_{i-1} >> 15).

    Preserves the value; after one pass limbs are <= 0x7FFF + max(x)>>15.
    Output has len(cols)+1 limbs unless n_out trims it (caller guarantees
    the trimmed limbs are zero by value bounds)."""
    lo = cols & MASK
    hi = cols >> np.uint32(W)
    pad = ((1, 0),) + ((0, 0),) * (cols.ndim - 1)
    out = jnp.pad(lo, ((0, 1),) + pad[1:]) + jnp.pad(hi, pad)
    if n_out is not None:
        out = out[:n_out]
    return out


def _pass2(cols, n_out: int | None = None):
    """Two carry passes: limbs from < 2^22 down to nearly clean (<= 0x8008
    when inputs were < 2^30)."""
    return _pass(_pass(cols), n_out)


def _mul_cols(a, b):
    """Schoolbook column sums of limb arrays (na,*B) x (nb,*B), limbs
    nearly clean.  Columns < (na+nb) * (2^15+8)^2 / 2^15 * 2 < 2^22 for
    na+nb <= 40."""
    na = a.shape[0]
    acc = None
    pad1 = ((0, 0),) * (b.ndim - 1)
    for i in range(na):
        p = a[i][None] * b
        contrib = jnp.pad(p & MASK, ((i, na - i),) + pad1) + jnp.pad(p >> np.uint32(W), ((i + 1, na - i - 1),) + pad1)
        acc = contrib if acc is None else acc + contrib
    return acc


def _mul_const_cols(const_limbs: list[int], b):
    """(python-int constant digits) * (nearly clean limb array)."""
    nc = len(const_limbs)
    acc = None
    pad1 = ((0, 0),) * (b.ndim - 1)
    for i, ci in enumerate(const_limbs):
        if ci == 0:
            continue
        p = b * np.uint32(ci)
        contrib = jnp.pad(p & MASK, ((i, nc - i),) + pad1) + jnp.pad(p >> np.uint32(W), ((i + 1, nc - i - 1),) + pad1)
        acc = contrib if acc is None else acc + contrib
    if acc is None:
        acc = jnp.zeros((nc + b.shape[0],) + b.shape[1:], U32)
    return acc


def _const_col(limbs: list[int], batch_ndim: int) -> jnp.ndarray:
    a = np.array(limbs, np.uint32).reshape((len(limbs),) + (1,) * batch_ndim)
    return jnp.asarray(a)


def _dom_digits(K: int, m: int, total: int) -> list[int]:
    """Digits of K such that digit_i >= _DOM for i < m (borrow-free cover
    of an m-limb subtrahend).  K must satisfy K >= _DOM * U_m."""
    x = K - _DOM * (((1 << (W * m)) - 1) // ((1 << W) - 1))
    assert x >= 0
    xs = int_to_limbs(x, total)
    return [xs[i] + (_DOM if i < m else 0) for i in range(total)]


class Field:
    """Vectorized limb arithmetic for p = 2^254 + c (c < 2^126)."""

    def __init__(self, p: int, name: str):
        self.p = p
        self.name = name
        self.c = p - (1 << 254)
        assert 0 < self.c < (1 << 126)
        # 2^255 = -c2 (mod p)
        self.c2_limbs = int_to_limbs(2 * self.c, 9)
        # K18: multiple of p with 15-bit digits >= _DOM on limbs 0..17
        # (borrow-free K - b for 18-limb nearly-clean-sum subtrahends).
        u18 = ((1 << (W * 18)) - 1) // ((1 << W) - 1)
        k18 = p * ((_DOM * u18 + 2 * p) // p)
        self.k18 = _dom_digits(k18, 18, 20)
        # K12: same for 12-limb subtrahends (fold tails, X < 2^172);
        # DOM*U12 ~ 2^182 < p, so K12 = p itself suffices.
        self.k12 = _dom_digits(p, 12, 18)

    # -- internal reduction helpers ----------------------------------------

    def _const_minus(self, kdigits: list[int], b):
        """Borrow-free K - b as unclean limbs; b nearly clean (or limb sums
        of two nearly-cleans), len(b) <= covered prefix of kdigits."""
        nb = b.shape[0]
        k = _const_col(kdigits, b.ndim - 1)
        if nb < len(kdigits):
            b = jnp.pad(b, ((0, len(kdigits) - nb),) + ((0, 0),) * (b.ndim - 1))
        return k - b

    def _fold_tail(self, x):
        """x: limbs (18..20), value < 2^273, limbs nearly clean.  Returns
        18 limbs, value < 2^256 + p < 2^257 (GOOD), nearly clean.

        Uses 2^255 = -2c (mod p): value = low + 2^255*high = low - 2c*high
        = low + (K12 - 2c*high) with K12 = p."""
        n = x.shape[0]
        low = x[:17]  # < 2^256 (17 nearly clean limbs)
        high = x[17:n]  # value < 2^18 (limbs above that forced zero by bound)
        X = _pass2(_mul_const_cols(self.c2_limbs, high), 12)  # 2c*high < 2^145
        d = self._const_minus(self.k12, X)  # p - X, 18 limbs, < 2^18 each
        pad1 = ((0, 1),) + ((0, 0),) * (low.ndim - 1)
        return _pass(jnp.pad(low, pad1) + d, 18)

    def _reduce_wide(self, t):
        """Full reduction of a product: t nearly clean, <= 36 limbs,
        value < 2^527.  Returns GOOD 18 limbs."""
        n = t.shape[0]
        low0 = t[:17]
        h0 = t[17:n]  # value < 2^272
        X1 = _pass2(_mul_const_cols(self.c2_limbs, h0))  # < 2^399, 29ish limbs
        low1 = X1[:17]
        h1 = X1[17:]
        X2 = _pass2(_mul_const_cols(self.c2_limbs, h1), 20)  # < 2^271
        low2 = X2[:17]
        h2 = X2[17:20]  # < 2^16
        X3 = _pass2(_mul_const_cols(self.c2_limbs, h2), 12)  # < 2^143
        # value = low0 - X1 = low0 - (low1 - (low2 - X3))
        #       = (low0 + low2) - (low1 + X3)
        pos = low0 + low2  # limbs <= 2^16.1
        neg = jnp.pad(low1, ((0, 1),) + ((0, 0),) * (t.ndim - 1)) + jnp.pad(
            X3, ((0, 6),) + ((0, 0),) * (t.ndim - 1)
        )  # 18 limbs, limbs <= 2^16.1 <= _DOM
        d = self._const_minus(self.k18, neg)  # 20 limbs, limbs < 2^18
        r = _pass(jnp.pad(pos, ((0, 3),) + ((0, 0),) * (t.ndim - 1)) + d, 20)
        # r value < 2^257 + K18 < 2^273, limbs nearly clean
        return self._fold_tail(r)

    # -- construction / conversion ------------------------------------------

    def zeros(self, batch_shape=()):
        return jnp.zeros((L,) + tuple(batch_shape), U32)

    def from_int(self, v: int, batch_shape=()):
        arr = np.array(int_to_limbs(v % self.p), np.uint32).reshape((L,) + (1,) * len(batch_shape))
        return jnp.broadcast_to(jnp.asarray(arr), (L,) + tuple(batch_shape))

    def from_ints(self, vs) -> jnp.ndarray:
        vs = list(vs)
        arr = np.zeros((L, len(vs)), np.uint32)
        for j, v in enumerate(vs):
            arr[:, j] = int_to_limbs(v % self.p)
        return jnp.asarray(arr)

    def to_ints(self, a) -> np.ndarray:
        from halo_accumulation_tpu.runtime import cached_jit

        arr = np.asarray(jax.device_get(cached_jit(self.canon, self.name)(a))).astype(object)
        flat = arr.reshape(L, -1)
        vals = np.empty(flat.shape[1], object)
        for j in range(flat.shape[1]):
            vals[j] = limbs_to_int(flat[:, j])
        if a.ndim == 1:
            return vals[0]
        return vals.reshape(a.shape[1:])

    # -- arithmetic ---------------------------------------------------------
    # Contracts: inputs GOOD-ish (nearly clean limbs, value < 2^263);
    # mul/sub/neg/mul_small outputs GOOD (< 2^257); add output < in_a+in_b.

    def add(self, a, b):
        """Lazy add: value grows; fold via fold() or any multiply.  Output
        limbs nearly clean."""
        return _pass(a + b, L)

    def fold(self, a):
        """Re-normalize a lazily grown value (< 2^273) back to GOOD."""
        return self._fold_tail(jnp.pad(a, ((0, 2),) + ((0, 0),) * (a.ndim - 1)))

    def sub(self, a, b):
        d = self._const_minus(self.k18, b)  # 20 limbs
        r = _pass(jnp.pad(a, ((0, 2),) + ((0, 0),) * (a.ndim - 1)) + d, 20)
        return self._fold_tail(r)

    def neg(self, a):
        d = self._const_minus(self.k18, a)
        return self._fold_tail(_pass(d, 20))

    def mul(self, a, b):
        t = _pass2(_mul_cols(a, b))
        return self._reduce_wide(t)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for a small positive python-int k (k < 2^12)."""
        assert 0 < k < (1 << 12)
        cols = a * np.uint32(k)  # limbs < 2^28
        t = _pass2(cols)  # 20 limbs, value < 2^275-ish
        return self._fold_tail(t)

    # -- canonicalization ---------------------------------------------------

    def _ripple(self, x, n_out: int):
        """Exact sequential carry: clean 15-bit limbs."""
        out = []
        c = None
        n = x.shape[0]
        for i in range(n_out):
            t = x[i] if i < n else None
            if t is None and c is None:
                out.append(jnp.zeros_like(x[0]))
                continue
            if t is None:
                t = c
            elif c is not None:
                t = t + c
            out.append(t & MASK)
            c = t >> np.uint32(W)
        return jnp.stack(out)

    def _cond_sub(self, v, K: int):
        """v clean limbs (n), K < 2^(15n): subtract K if v >= K."""
        n = v.shape[0]
        comp = _const_col(int_to_limbs((1 << (W * n)) - K, n), v.ndim - 1)
        t = self._ripple(v + comp, n + 1)
        ge = t[n].astype(jnp.bool_)
        return jnp.where(ge[None], t[:n], v)

    def canon(self, a):
        """Exact canonical form: clean 15-bit limbs, value < p."""
        x = self.fold(a)  # < 2^256 + 2^198 < 4.1 p
        x = self._ripple(x, L)
        x = self._cond_sub(x, 2 * self.p)
        x = self._cond_sub(x, 2 * self.p)
        x = self._cond_sub(x, self.p)
        return x

    # -- predicates / misc --------------------------------------------------

    def select(self, m, a, b):
        return jnp.where(m[None], a, b)

    def eq(self, a, b):
        return jnp.all(self.canon(a) == self.canon(b), axis=0)

    def is_zero(self, a):
        return jnp.all(self.canon(a) == 0, axis=0)

    def pow_const(self, a, e: int):
        nbits = max(1, e.bit_length())
        bits = jnp.asarray(np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32))
        one = self.from_int(1, a.shape[1:])

        def body(i, acc):
            acc = self.mul(acc, acc)
            t = self.mul(acc, a)
            return jnp.where(bits[i].astype(jnp.bool_), t, acc)

        return jax.lax.fori_loop(0, nbits, body, one)

    def inv(self, a):
        """Batched inversion via a binary product tree (+1 Fermat at the
        root); 0 -> 0."""
        batch = a.shape[1:]
        if not batch:
            return self.pow_const(a, self.p - 2)
        n = int(np.prod(batch))
        flat = a.reshape(L, n)
        nz = ~self.is_zero(flat)
        flat = jnp.where(nz[None], flat, self.from_int(1, (n,)))
        m = 1
        while m < n:
            m *= 2
        if m != n:
            flat = jnp.concatenate([flat, self.from_int(1, (m - n,))], axis=1)
        levels = [flat]
        cur = flat
        while cur.shape[1] > 1:
            cur = self.mul(cur[:, 0::2], cur[:, 1::2])
            levels.append(cur)
        inv = self.pow_const(cur, self.p - 2)
        for lev in reversed(levels[:-1]):
            left = self.mul(inv, lev[:, 1::2])
            right = self.mul(inv, lev[:, 0::2])
            inv = jnp.stack([left, right], axis=2).reshape(L, lev.shape[1])
        inv = inv[:, :n]
        inv = jnp.where(nz[None], inv, jnp.zeros_like(inv))
        return inv.reshape((L,) + batch)

    def sum_along(self, a, axis: int):
        """Tree-reduce a batch axis with lazy adds, folding every few
        levels to keep values GOOD."""
        ax = axis + 1
        level = 0
        while a.shape[ax] > 1:
            n = a.shape[ax]
            half = n // 2
            lo = jax.lax.slice_in_dim(a, 0, half, axis=ax)
            hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=ax)
            s = self.add(lo, hi)
            level += 1
            if level % 3 == 0:
                s = self.fold(s)
            if n % 2:
                s = jnp.concatenate([s, jax.lax.slice_in_dim(a, 2 * half, n, axis=ax)], axis=ax)
            a = s
        return jnp.squeeze(a, axis=ax)


from halo_accumulation_tpu import fields as _f

FQ = Field(_f.Q, "Fq")
FR = Field(_f.R, "Fr")
