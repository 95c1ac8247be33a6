"""Pure-Python-integer reference implementation of all cryptographic primitives.

This subpackage is the *oracle*: slow, obviously-correct big-int code used to
(a) generate test vectors for the JAX/Pallas device kernels in
:mod:`vote_saver_tpu.ops`, and (b) run the host-side pairing checks in the
verification paths (pairings are verification-only; the hot proving path runs
on device).

Nothing here is a translation of crypto3 — the algorithms are implemented from
the curve standards (BLS12-381 / JubJub) and the Groth16 / SAVER papers.
"""
