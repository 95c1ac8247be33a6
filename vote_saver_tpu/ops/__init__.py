"""Device (JAX/XLA/Pallas) kernels: the compute path of the framework.

Everything here is batched, jit-compatible and static-shaped.  Field elements
travel as uint32 arrays of 16-bit limbs (little-endian, Montgomery form), a
layout chosen so limb products are exact in uint32 and column sums of product
halves are exact in float32 — letting XLA put the schoolbook-multiply
accumulation on the MXU while carry chains ride the VPU.

Replaces crypto3's multiprecision/algebra/math usage (SURVEY.md §2B).
"""
