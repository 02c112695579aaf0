"""halo_accumulation_tpu: a TPU-native Halo accumulation library.

A from-scratch JAX/XLA implementation (with a native C++ host backend and
Pallas-kernel hot paths) of the capabilities of rasmus-kirk/halo-accumulation:

  * PCDL - a discrete-log polynomial commitment scheme over the Pallas
    curve (Pedersen commit + Bulletproofs-style IPA open / succinct_check /
    check), /root/reference/code/src/pcdl.rs.
  * ASDL - the BCMS 2020 accumulation scheme (common subroutine, prover,
    verifier, decider), /root/reference/code/src/acc.rs.
  * A hash-derived URS (setup) matching the reference's generators
    bit-exactly, generated on device instead of baked into source.
  * TPU-native extras the reference lacks: batched verification, sharded
    multi-chip MSM, proof (de)serialization, a benchmark harness.

Quick start:

    import numpy as np
    from halo_accumulation_tpu import api

    pp = api.setup(n=1024)
    rng = np.random.default_rng(0)
    p = [1, 2, 3, 4]                      # coefficients, low-to-high
    C = api.commit(p, d=1023, w=None, pp=pp)
    pi = api.open(rng, p, C, d=1023, z=7, w=None, pp=pp)
    api.check(C, d=1023, z=7, v=api.eval_poly(p, 7), pi=pi, pp=pp)
"""

from halo_accumulation_tpu import runtime  # noqa: F401

__version__ = "0.1.0"
