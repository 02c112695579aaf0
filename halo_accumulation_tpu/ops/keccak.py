"""SHA3-256 on device (keccak-f[1600] over uint32 pairs) + transcript
scalar packing.

The IPA open's lg(n) fold rounds are inherently sequential through their
Fiat-Shamir challenges (xi_{i+1} = rho_0(xi_i, L_i, R_i),
/root/reference/code/src/pcdl.rs:212): with host-side hashing every round
costs a device->host fetch (~25 ms through the remote TPU tunnel), putting
a lg(n) * RTT latency floor under the prover.  Computing the hash ON
DEVICE removes the boundary entirely - the whole fold loop becomes one
jit-compiled dispatch (pcdl._open_fold_device).

TPUs have no uint64, so the 25-lane keccak state is (25, 2) uint32
(lo, hi); rotations and xors unroll statically (24 rounds of scalar u32
ops - trivial runtime, executed once per fold round).  Byte layouts match
utils/serialize.py bit-for-bit (tests/test_keccak.py pins both against
hashlib and the host transcript)."""

from __future__ import annotations

import numpy as np

from halo_accumulation_tpu import fields as _fields
from halo_accumulation_tpu.ops.field import L

# keccak-f[1600] round constants as (lo, hi) u32 pairs
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROTC = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


# per-lane rotation amounts in flat index order i = x + 5*y
_ROT_FLAT = np.array(
    [_ROTC[i % 5][i // 5] for i in range(25)], np.uint32
)
# pi permutation: dst[y + 5*((2x+3y)%5)] = src[x + 5y]  =>  flat gather map
_PI_SRC = np.zeros(25, np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], np.uint32)


def _rotl_vec(lo, hi, r):
    """Rotate (25,)-lane u64 pairs left by per-lane amounts r (u32 array).
    Variable vector shifts; the s==0 lanes are select-masked (a >> 32 is
    avoided by masking the shift amount)."""
    import jax.numpy as jnp

    s = r % np.uint32(32)
    swap = r >= np.uint32(32)
    l1 = jnp.where(swap, hi, lo)
    h1 = jnp.where(swap, lo, hi)
    t = (np.uint32(32) - s) & np.uint32(31)
    lo2 = jnp.where(s == 0, l1, (l1 << s) | (h1 >> t))
    hi2 = jnp.where(s == 0, h1, (h1 << s) | (l1 >> t))
    return lo2, hi2


def keccak_f(state):
    """One keccak-f[1600] permutation, vectorized over the 25 lanes (TPUs
    have no u64: each lane is a (lo, hi) u32 pair).  state: list of 25
    (lo, hi) scalar pairs in flat order i = x + 5*y (FIPS 202); returns the
    same.  ~20 small array ops per round - the fully-unrolled scalar form
    produced a ~10k-op HLO graph that XLA:CPU took minutes to compile."""
    import jax.numpy as jnp

    lo = jnp.stack([s[0] for s in state])  # (25,)
    hi = jnp.stack([s[1] for s in state])
    rot = jnp.asarray(_ROT_FLAT)
    pi = jnp.asarray(_PI_SRC)
    one = np.uint32(1)
    t31 = np.uint32(31)
    for r in range(24):
        # theta
        l5 = lo.reshape(5, 5)  # [y, x]
        h5 = hi.reshape(5, 5)
        cl = l5[0] ^ l5[1] ^ l5[2] ^ l5[3] ^ l5[4]  # (5,) over x
        ch = h5[0] ^ h5[1] ^ h5[2] ^ h5[3] ^ h5[4]
        cl1 = jnp.roll(cl, -1)
        ch1 = jnp.roll(ch, -1)
        dl = jnp.roll(cl, 1) ^ ((cl1 << one) | (ch1 >> t31))
        dh = jnp.roll(ch, 1) ^ ((ch1 << one) | (cl1 >> t31))
        lo = (l5 ^ dl[None, :]).reshape(25)
        hi = (h5 ^ dh[None, :]).reshape(25)
        # rho + pi (gather the pre-rotation source lane, then rotate)
        lo, hi = _rotl_vec(jnp.take(lo, pi), jnp.take(hi, pi), jnp.take(rot, pi))
        # chi: b[x] ^ (~b[x+1] & b[x+2]) along x
        l5 = lo.reshape(5, 5)
        h5 = hi.reshape(5, 5)
        lo = (l5 ^ (~jnp.roll(l5, -1, axis=1) & jnp.roll(l5, -2, axis=1))).reshape(25)
        hi = (h5 ^ (~jnp.roll(h5, -1, axis=1) & jnp.roll(h5, -2, axis=1))).reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ np.uint32(_RC_LO[r]))
        hi = hi.at[0].set(hi[0] ^ np.uint32(_RC_HI[r]))
    return [(lo[i], hi[i]) for i in range(25)]


def sha3_256_words(words, nbytes: int):
    """SHA3-256 of a message laid out as u32 scalar words (little-endian
    byte order), nbytes <= 135 (single rate block).  Returns 8 u32 words of
    digest.  words: list of ceil(nbytes/4) u32 scalars; the final partial
    word (if any) must be zero-padded ABOVE its message bytes."""
    import jax.numpy as jnp

    assert nbytes <= 135, "single-block absorb only"
    nw = (nbytes + 3) // 4
    assert len(words) >= nw
    full = [jnp.uint32(0)] * 34  # 136-byte rate as 34 u32 words
    for i in range(nw):
        full[i] = full[i] | words[i]
    # domain padding: 0x06 after the message, 0x80 at the rate's last byte
    full[nbytes // 4] = full[nbytes // 4] | np.uint32(0x06 << (8 * (nbytes % 4)))
    full[33] = full[33] | np.uint32(0x80 << 24)
    zero = jnp.uint32(0)
    state = [(zero, zero)] * 25
    st = []
    for i in range(17):  # 17 u64 lanes of rate
        st.append((state[i][0] ^ full[2 * i], state[i][1] ^ full[2 * i + 1]))
    st.extend(state[17:])
    out = keccak_f(st)
    dig = []
    for i in range(4):  # 32 bytes = 4 u64 lanes
        dig.extend([out[i][0], out[i][1]])
    return dig


def limbs_to_words(v):
    """Canonical (L,) 15-bit limb scalar -> 8 u32 LE words (32 bytes)."""
    import jax.numpy as jnp

    words = []
    for j in range(8):
        bit0 = 32 * j
        acc = jnp.uint32(0)
        # a 32-bit window spans ceil(32/15)+1 = up to 4 limbs
        for k in range(L):
            lo_bit = 15 * k
            if lo_bit + 15 <= bit0 or lo_bit >= bit0 + 32:
                continue
            sh = lo_bit - bit0
            if sh >= 0:
                acc = acc | (v[k].astype(jnp.uint32) << np.uint32(sh))
            else:
                acc = acc | (v[k].astype(jnp.uint32) >> np.uint32(-sh))
        words.append(acc)
    return words


def words_to_limbs(words):
    """8 u32 LE words (a 256-bit value) -> (L=18,) 15-bit limbs of the FULL
    value (not reduced; top limb carries bits 255..269 = 1 bit)."""
    import jax.numpy as jnp

    limbs = []
    for k in range(L):
        bit0 = 15 * k
        acc = jnp.uint32(0)
        for j in range(8):
            lo_bit = 32 * j
            if lo_bit + 32 <= bit0 or lo_bit >= bit0 + 15:
                continue
            sh = lo_bit - bit0
            if sh >= 0:
                acc = acc | (words[j] << np.uint32(sh))
            else:
                acc = acc | (words[j] >> np.uint32(-sh))
        limbs.append(acc & np.uint32(0x7FFF))
    import jax.numpy as jnp

    return jnp.stack(limbs)


_R_LIMBS = [(_fields.R >> (15 * i)) & 0x7FFF for i in range(L)]


def mod_r_256(limbs):
    """(L,) limbs of a value < 2^256 -> canonical mod r (r > 2^254, so at
    most 3 conditional subtracts)."""
    import jax.numpy as jnp

    v = limbs.astype(jnp.int32)
    r = jnp.asarray(np.array(_R_LIMBS, np.int32))
    for _ in range(3):
        # lexicographic compare v >= r from the top limb down (static)
        eq = jnp.bool_(True)
        gt = jnp.bool_(False)
        for k in range(L - 1, -1, -1):
            gt = gt | (eq & (v[k] > r[k]))
            eq = eq & (v[k] == r[k])
        ge = gt | eq
        # conditional subtract with borrow propagation
        diff = []
        borrow = jnp.int32(0)
        for k in range(L):
            dk = v[k] - r[k] - borrow
            borrow = (dk < 0).astype(jnp.int32)
            diff.append(dk + borrow * 32768)
        diff = jnp.stack(diff)
        v = jnp.where(ge, diff, v)
    return v.astype(jnp.uint32)


def limbs_gt_const(v, const: int):
    """Lexicographic (v > const) for a canonical (L,) 15-bit limb scalar
    against a python-int constant (static unroll)."""
    import jax.numpy as jnp

    c = [(const >> (15 * i)) & 0x7FFF for i in range(L)]
    eq = jnp.bool_(True)
    gt = jnp.bool_(False)
    for k in range(L - 1, -1, -1):
        ck = np.uint32(c[k])
        gt = gt | (eq & (v[k] > ck))
        eq = eq & (v[k] == ck)
    return gt


def emit_bytes(msgw: list, byteoff: int, words, nbytes: int):
    """OR `nbytes` little-endian bytes held in u32 `words` into the u32
    word list `msgw` starting at byte offset `byteoff` (static offsets;
    handles word-misaligned placement with cross-word shifts).  Assumes the
    source words are zero above their message bytes."""
    sh = (byteoff % 4) * 8
    base = byteoff // 4
    nw = (nbytes + 3) // 4
    for i in range(nw):
        w = words[i]
        # mask the final partial source word
        rem = nbytes - 4 * i
        if rem < 4:
            w = w & np.uint32((1 << (8 * rem)) - 1)
        if sh == 0:
            msgw[base + i] = msgw[base + i] | w
        else:
            msgw[base + i] = msgw[base + i] | (w << np.uint32(sh))
            msgw[base + i + 1] = msgw[base + i + 1] | (w >> np.uint32(32 - sh))
    return msgw


def rho_device(parts_words, nbytes: int, tag: int):
    """Device rho_tag: sha3_256(concat(parts) || tag u32 LE) reduced into
    canonical Fr limbs.  parts_words: u32 word list covering nbytes bytes
    (nbytes % 4 == 0 for all current call sites); tag appended per
    group.rs:54,79."""
    assert nbytes % 4 == 0
    words = list(parts_words) + [np.uint32(tag)]
    dig = sha3_256_words(words, nbytes + 4)
    return mod_r_256(words_to_limbs(dig))
