"""Device SHA3/transcript vs hashlib and the host transcript layer."""

import hashlib

import numpy as np

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.ops import keccak
from halo_accumulation_tpu.ops.field import FR
from halo_accumulation_tpu.runtime import cached_jit
from halo_accumulation_tpu.utils import serialize as ser
from halo_accumulation_tpu.utils import transcript as tr


def _words_from_bytes(b: bytes):
    import jax.numpy as jnp

    pad = (-len(b)) % 4
    bb = b + b"\x00" * pad
    return [jnp.uint32(int.from_bytes(bb[4 * i : 4 * i + 4], "little")) for i in range(len(bb) // 4)]


def test_sha3_matches_hashlib(rng):
    import jax

    for nbytes in (0, 1, 4, 31, 32, 64, 100, 102, 135):
        msg = rng.bytes(nbytes)
        fn = cached_jit(
            lambda *w, nb=nbytes: keccak.sha3_256_words(list(w), nb), "sha3", nbytes
        )
        dig_words = fn(*_words_from_bytes(msg)) if nbytes else fn(*_words_from_bytes(b"\x00" * 4))
        if nbytes == 0:
            dig_words = cached_jit(lambda w: keccak.sha3_256_words([w], 0), "sha30")(
                _words_from_bytes(b"\x00\x00\x00\x00")[0]
            )
        got = b"".join(int(np.asarray(jax.device_get(w))).to_bytes(4, "little") for w in dig_words)
        assert got == hashlib.sha3_256(msg).digest(), f"nbytes={nbytes}"


def test_limb_word_packing(rng):
    import jax

    for _ in range(5):
        v = int.from_bytes(rng.bytes(40), "little") % F.R
        limbs = FR.from_ints([v])[:, 0]
        words = cached_jit(lambda x: keccak.limbs_to_words(x), "l2w")(limbs)
        b = b"".join(int(np.asarray(jax.device_get(w))).to_bytes(4, "little") for w in words)
        assert b == v.to_bytes(32, "little")
    # words -> limbs -> mod r
    for _ in range(5):
        raw = rng.bytes(32)
        words = _words_from_bytes(raw)
        out = cached_jit(
            lambda *w: keccak.mod_r_256(keccak.words_to_limbs(list(w))), "w2l"
        )(*words)
        got = sum(int(x) << (15 * i) for i, x in enumerate(np.asarray(out)))
        assert got == int.from_bytes(raw, "little") % F.R


def test_rho_device_matches_host(rng):
    for tag in (0, 1):
        for nparts in (1, 3):
            parts = [ser.ser_scalar(int.from_bytes(rng.bytes(40), "little") % F.R) for _ in range(nparts)]
            blob = b"".join(parts)
            want = tr.rho_0(*parts) if tag == 0 else tr.rho_1(*parts)
            out = cached_jit(
                lambda *w, nb=len(blob), tg=tag: keccak.rho_device(list(w), nb, tg),
                "rho", tag, len(blob),
            )(*_words_from_bytes(blob))
            got = sum(int(x) << (15 * i) for i, x in enumerate(np.asarray(out)))
            assert got == want
