"""IVC-style accumulation chains: builders and batch verification drivers.

Mirrors the reference's benchmark chain semantics
(/root/reference/code/benches/acc.rs):

  * random_instance (:15-29): commit to a random polynomial of degree
    d' ~ U[d/2, d) with hiding, evaluate at random z, open.
  * acc_compare chain builder (:76-98): step 0 accumulates [q_0]; step i
    accumulates [acc_{i-1} as an instance, q_i].
  * fast helper (:64-74): one verifier call per step + one final decider -
    implemented here by acc.verify_chain (all steps' succinct checks batch
    into one device call).
  * slow helper (:100-106): one full decider per step.

These live in the library (not the bench script) so tests can assert the
batched fast path is equivalent to step-by-step verifier+decider.
"""

from __future__ import annotations

import numpy as np

from halo_accumulation_tpu import acc as acc_mod
from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu import pcdl
from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.ops.field import FR


def rand_scalar(rng: np.random.Generator) -> int:
    return int.from_bytes(rng.bytes(40), "little") % F.R


def random_instance(rng: np.random.Generator, d: int, pp: pp_mod.PublicParams) -> acc_mod.Instance:
    """A random hiding instance (benches/acc.rs:15-29)."""
    d_prime = int(rng.integers(d // 2, d))
    w = rand_scalar(rng)
    coeffs = [rand_scalar(rng) for _ in range(d_prime + 1)]
    z = rand_scalar(rng)
    # v = p(z) on host ints (exact; this value is hashed into transcripts)
    v, zp = 0, 1
    for co in coeffs:
        v = (v + co * zp) % F.R
        zp = zp * z % F.R
    cd = FR.from_ints(coeffs)
    C = pcdl.commit(cd, d, w, pp)
    pi = pcdl.open_(rng, cd, C, d, z, w, pp, v=v)
    return acc_mod.Instance(C=C, d=d, z=z, v=v, pi=pi)


def build_chain(rng: np.random.Generator, n: int, k: int, pp: pp_mod.PublicParams):
    """k-step accumulation chain at d = n - 1 (benches/acc.rs:76-98).
    Returns (d, qss, accs)."""
    d = n - 1
    qss, accs = [], []
    prev = None
    for _ in range(k):
        q = random_instance(rng, d, pp)
        qs = [prev.to_instance(), q] if prev is not None else [q]
        prev = acc_mod.prover(rng, d, qs, pp)
        qss.append(qs)
        accs.append(prev)
    return d, qss, accs


def deserialize_instance(b: bytes):
    """Parse one serialized Instance; returns (Instance, bytes_used)."""
    from halo_accumulation_tpu.utils import serialize as ser

    off = 0
    C = ser.deser_point(b[off : off + ser.POINT_BYTES])
    off += ser.POINT_BYTES
    d = int.from_bytes(b[off : off + 8], "little")
    off += 8
    z = int.from_bytes(b[off : off + 32], "little")
    off += 32
    v = int.from_bytes(b[off : off + 32], "little")
    off += 32
    pi, used = acc_mod._parse_evalproof(b[off:])
    off += used
    return acc_mod.Instance(C=C, d=d, z=z, v=v, pi=pi), off


CHAIN_MAGIC = b"HALOCHN2"  # format tag (ADVICE r3: version the cache)


def save_chain(path, d: int, qss, accs) -> None:
    """Persist a built chain (setup state, not timed work - criterion
    likewise excludes chain construction from the measured helpers).
    Format: magic tag || d u64 || k u64 || per-step records."""
    import pathlib

    out = [CHAIN_MAGIC, d.to_bytes(8, "little"), len(accs).to_bytes(8, "little")]
    for qs, acc in zip(qss, accs):
        out.append(len(qs).to_bytes(8, "little"))
        out.extend(q.serialize() for q in qs)
        ab = acc_mod.serialize_accumulator(acc)
        out.append(len(ab).to_bytes(8, "little"))
        out.append(ab)
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"".join(out))


def load_chain(path):
    """Load a chain saved by save_chain: returns (d, qss, accs)."""
    b = __import__("pathlib").Path(path).read_bytes()
    off = 0
    # legacy (round-3) caches carry no magic; their first field is d <= 2^22,
    # which can never collide with the magic's first byte 'H' = 0x48
    if b[:8] == CHAIN_MAGIC:
        off = 8
    d = int.from_bytes(b[off : off + 8], "little")
    off += 8
    k = int.from_bytes(b[off : off + 8], "little")
    off += 8
    qss, accs = [], []
    for _ in range(k):
        m = int.from_bytes(b[off : off + 8], "little")
        off += 8
        qs = []
        for _ in range(m):
            q, used = deserialize_instance(b[off:])
            off += used
            qs.append(q)
        alen = int.from_bytes(b[off : off + 8], "little")
        off += 8
        accs.append(acc_mod.deserialize_accumulator(b[off : off + alen]))
        off += alen
        qss.append(qs)
    return d, qss, accs


def verify_chain_fast(d: int, qss, accs, pp: pp_mod.PublicParams) -> None:
    """Fast path: verifier at every step + one final decider, batched
    (benches/acc.rs:64-74).  Raises ValueError on rejection."""
    acc_mod.verify_chain(d, qss, accs, pp)


def verify_chain_slow(accs, pp: pp_mod.PublicParams) -> None:
    """Slow/naive path: a full decider per step (benches/acc.rs:100-106),
    enqueued back-to-back with one combined verdict fetch (same work and
    verdicts; the tunnel round trip is paid once, not k times)."""
    acc_mod.decide_many(accs, pp)
