"""Vectorized 255-bit prime-field arithmetic for the Pasta fields, in JAX.

TPU-native design (no counterpart in the Rust reference, which delegates to
arkworks' 4x64-bit Montgomery code - /root/reference/code/Cargo.toml ark-ff):

  * A field element is 16 limbs of 16 bits stored as uint32, limb-major:
    an array of shape (16, *batch).  16-bit limbs keep every partial product
    (< 2^32) exact in uint32 VPU lanes, and column sums of up to 32 partial
    products stay < 2^22 - no 64-bit math needed anywhere.
  * Lazy representation: stored values satisfy v < 2p.  Only serialization,
    comparison and digit extraction canonicalize (one conditional subtract).
  * Reduction exploits the sparse Pasta prime shape p = 2^254 + c with
    c < 2^126:  2^254 = -c (mod p), so a wide value folds in two stages of
    multiply-by-c, entirely branchless.  No Montgomery form, no data
    dependent control flow - everything maps onto straight-line VPU code.
  * Schoolbook partial products are accumulated with padded shifts of whole
    limb-planes (not per-(i,j) scalar ops) to keep HLO graphs small; carry
    ripples are the only per-limb sequential chains.

All public functions operate on stacked uint32 arrays with the limb axis
first and are safe to call under jit/vmap/shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

L = 16  # number of limbs
W = 16  # bits per limb
MASK = np.uint32(0xFFFF)
U32 = jnp.uint32


def int_to_limbs(v: int) -> list[int]:
    """Python int -> list of L 16-bit limb ints (little-endian)."""
    assert 0 <= v < (1 << (L * W))
    return [(v >> (W * i)) & 0xFFFF for i in range(L)]


def limbs_to_int(limbs) -> int:
    v = 0
    for i, l in enumerate(limbs):
        v |= int(l) << (W * i)
    return v


def _wide_int_to_limbs(v: int, n: int) -> list[int]:
    assert 0 <= v < (1 << (W * n))
    return [(v >> (W * i)) & 0xFFFF for i in range(n)]


def _const_col(limbs: list[int], batch_ndim: int) -> jnp.ndarray:
    """Python limb list -> (n, 1, 1, ...) broadcastable uint32 constant."""
    a = np.array(limbs, np.uint32).reshape((len(limbs),) + (1,) * batch_ndim)
    return jnp.asarray(a)


def _pad_limbs(x, lo: int, hi: int):
    """Pad the limb axis (axis 0) with `lo` zeros below and `hi` above."""
    cfg = ((lo, hi),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, cfg)


def _carry(cols, n_out: int):
    """Ripple carries over stacked column sums (n, *batch) -> clean
    (n_out, *batch) 16-bit limbs.  Caller guarantees the value fits."""
    n = cols.shape[0]
    out = []
    c = None
    for i in range(n_out):
        t = cols[i] if i < n else None
        if t is None and c is None:
            out.append(jnp.zeros_like(cols[0]))
            continue
        if t is None:
            t = c
        elif c is not None:
            t = t + c
        out.append(t & MASK)
        c = t >> W
    return jnp.stack(out)


def _mul_columns(a, b):
    """Schoolbook column sums of two clean limb arrays (na,*B) x (nb,*B).

    Returns (na+nb, *B) columns, each < 2^22 (lo/hi-split accumulation)."""
    na = a.shape[0]
    nb = b.shape[0]
    acc = None
    for i in range(na):
        p = a[i][None] * b  # (nb, *B)
        contrib = _pad_limbs(p & MASK, i, na - i) + _pad_limbs(p >> W, i + 1, na - i - 1)
        acc = contrib if acc is None else acc + contrib
    return acc


def _mul_const_columns(const_limbs: list[int], b):
    """Column sums of (python constant) * (clean limb array (nb,*B))."""
    nc = len(const_limbs)
    nb = b.shape[0]
    acc = None
    for i, ci in enumerate(const_limbs):
        if ci == 0:
            continue
        p = b * np.uint32(ci)
        contrib = _pad_limbs(p & MASK, i, nc - i) + _pad_limbs(p >> W, i + 1, nc - i - 1)
        acc = contrib if acc is None else acc + contrib
    if acc is None:
        acc = jnp.zeros((nc + nb,) + b.shape[1:], U32)
    return acc


def _split254(t):
    """Split clean limbs (n,*B) at bit 254 -> (lo (16,*B) < 2^254, hi)."""
    n = t.shape[0]
    if n < 16:
        t = _pad_limbs(t, 0, 16 - n)
        n = 16
    lo = jnp.concatenate([t[:15], (t[15] & np.uint32(0x3FFF))[None]], axis=0)
    n_hi = n - 15
    top = t[15:] >> np.uint32(14)
    if n > 16:
        nxt = _pad_limbs((t[16:] & np.uint32(0x3FFF)) << np.uint32(2), 0, 1)
        hi = top | nxt
    else:
        hi = top
    assert hi.shape[0] == n_hi
    return lo, hi


class Field:
    """Vectorized limb arithmetic for p = 2^254 + c (c < 2^126)."""

    def __init__(self, p: int, name: str):
        self.p = p
        self.name = name
        self.c = p - (1 << 254)
        assert 0 < self.c < (1 << 126)
        self.c_limbs = _wide_int_to_limbs(self.c, 8)
        # Borrow-free representation of 4p as 17 inflated limbs k_i with
        # k_i >= 0xFFFF for i < 16:  digits of (4p - (2^256 - 1)) + 0xFFFF.
        x = 4 * p - ((1 << 256) - 1)
        assert x > 0
        xl = _wide_int_to_limbs(x, 17)
        self.k4p = [xl[i] + 0xFFFF for i in range(16)] + [xl[16]]

    # -- internal helpers ---------------------------------------------------

    def _const_minus(self, b):
        """Borrow-free (4p - b) for clean b (n<=17,*B) with value < 4p.
        Returns 17 unclean limbs (each < 2^17)."""
        nb = b.shape[0]
        assert nb <= 17
        k = _const_col(self.k4p, b.ndim - 1)
        if nb < 17:
            b = _pad_limbs(b, 0, 17 - nb)
        return k - b

    def _cond_sub(self, v, K: int):
        """If value(v) >= K: subtract K.  v clean (n,*B), K < 2^(16n)."""
        n = v.shape[0]
        comp = _const_col(_wide_int_to_limbs((1 << (W * n)) - K, n), v.ndim - 1)
        t = _carry(v + comp, n + 1)
        ge = t[n].astype(jnp.bool_)  # carry out of top limb <=> value >= K
        return jnp.where(ge[None], t[:n], v)

    def _reduce_from_254(self, lo, hi):
        """value = lo + 2^254*hi (lo (16,*B) < 2^254 clean, c*hi < 2^254)
        -> clean (16,*B) < 2p."""
        x = _carry(_mul_const_columns(self.c_limbs, hi), 16)
        d = self._const_minus(x)  # 4p - c*hi, 17 unclean limbs
        s = _carry(_pad_limbs(lo, 0, 1) + d, 17)  # < 2^254 + 4p < 6p
        s = self._cond_sub(s, 2 * self.p)
        s = self._cond_sub(s, 2 * self.p)
        return s[:16]

    # -- construction / conversion ------------------------------------------

    def zeros(self, batch_shape=()):
        return jnp.zeros((L,) + tuple(batch_shape), U32)

    def from_int(self, v: int, batch_shape=()):
        arr = np.array(int_to_limbs(v % self.p), np.uint32).reshape((L,) + (1,) * len(batch_shape))
        return jnp.broadcast_to(jnp.asarray(arr), (L,) + tuple(batch_shape))

    def from_ints(self, vs) -> jnp.ndarray:
        """Iterable of python ints -> (L, N) device array."""
        vs = list(vs)
        arr = np.zeros((L, len(vs)), np.uint32)
        for j, v in enumerate(vs):
            arr[:, j] = int_to_limbs(v % self.p)
        return jnp.asarray(arr)

    def to_ints(self, a) -> np.ndarray:
        """Device array (L, *batch) -> numpy object array of canonical ints
        (or a single int for an unbatched element)."""
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

    def add(self, a, b):
        s = _carry(a + b, 17)  # < 4p
        s = self._cond_sub(s, 2 * self.p)
        return s[:16]

    def sub(self, a, b):
        d = self._const_minus(b)  # 4p - b
        s = _carry(_pad_limbs(a, 0, 1) + d, 17)  # < 6p
        s = self._cond_sub(s, 2 * self.p)
        s = self._cond_sub(s, 2 * self.p)
        return s[:16]

    def neg(self, a):
        s = _carry(self._const_minus(a), 17)
        s = self._cond_sub(s, 2 * self.p)
        s = self._cond_sub(s, 2 * self.p)
        return s[:16]

    def mul(self, a, b):
        t = _carry(_mul_columns(a, b), 32)  # full product < 4p^2 < 2^511
        return self._reduce_wide(t)

    def _reduce_wide(self, t):
        """Reduce a clean wide value (<=32 limbs, < 2^511) to (16,*B) < 2p."""
        vlo, vhi = _split254(t)  # vhi < 2^257
        x1 = _carry(_mul_const_columns(self.c_limbs, vhi), 24)  # c*vhi < 2^383
        x1lo, x1hi = _split254(x1)  # x1hi < 2^129
        x2 = _carry(_mul_const_columns(self.c_limbs, x1hi), 17)  # < 2^255
        x2lo, x2hi = _split254(x2)  # x2hi in {0,1}
        x3 = _carry(_mul_const_columns(self.c_limbs, x2hi), 9)  # < 2^127
        # value = vlo + x2lo - (x1lo + x3)  (mod p)
        a2 = _pad_limbs(vlo + x2lo, 0, 1)  # < 2^255, unclean
        neg = _carry(_pad_limbs(x1lo, 0, 0) + _pad_limbs(x3, 0, 7), 16)  # < 2^255 < 4p
        d = self._const_minus(neg)
        s = _carry(a2 + d, 17)  # < 2^255 + 4p < 6p
        s = self._cond_sub(s, 2 * self.p)
        s = self._cond_sub(s, 2 * self.p)
        return s[:16]

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for a small positive python-int k (k < 2^12)."""
        assert 0 < k < (1 << 12)
        cols = a * np.uint32(k)
        t = _carry(cols, 17)  # < 2p * 2^12 < 2^268
        lo, hi = _split254(t)  # hi < 2^14
        return self._reduce_from_254(lo, hi)

    def canon(self, a):
        return self._cond_sub(a, self.p)

    def select(self, m, a, b):
        """Elementwise where over batch dims: m broadcastable to batch."""
        return jnp.where(m[None], a, b)

    def eq(self, a, b):
        return jnp.all(self.canon(a) == self.canon(b), axis=0)

    def is_zero(self, a):
        return jnp.all(self.canon(a) == 0, axis=0)

    def pow_const(self, a, e: int):
        """a^e for a python-int exponent, via fori_loop (2 muls / bit)."""
        nbits = max(1, e.bit_length())
        bits = jnp.asarray(np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32))
        one = self.from_int(1, a.shape[1:])

        def body(i, acc):
            acc = self.mul(acc, acc)
            t = self.mul(acc, a)
            return jnp.where(bits[i].astype(jnp.bool_), t, acc)

        return jax.lax.fori_loop(0, nbits, body, one)

    def inv(self, a):
        """Batched inversion via a binary product tree: ~3 muls/element plus
        one Fermat inversion at the root.  Maps 0 -> 0."""
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
        """Tree-reduce a batch axis with modular adds (axis 0 = first batch
        dim)."""
        ax = axis + 1
        while a.shape[ax] > 1:
            n = a.shape[ax]
            half = n // 2
            lo = jax.lax.slice_in_dim(a, 0, half, axis=ax)
            hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=ax)
            s = self.add(lo, hi)
            if n % 2:
                s = jnp.concatenate([s, jax.lax.slice_in_dim(a, 2 * half, n, axis=ax)], axis=ax)
            a = s
        return jnp.squeeze(a, axis=ax)


from halo_accumulation_tpu import fields as _f

FQ = Field(_f.Q, "Fq")
FR = Field(_f.R, "Fr")
