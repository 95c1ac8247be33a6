"""vote_saver_tpu — a TPU-native SAVER verifiable-encryption voting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NilFoundation/vote-saver-protocol (the crypto3-based SAVER voting stack):
Groth16 proofs over an encrypted-input voting circuit, SAVER additively
homomorphic verifiable encryption, Pedersen/JubJub Merkle registries, and the
six-phase election protocol API — with the hot paths (MSM, NTT, batched
witness generation, Pedersen hashing, ciphertext aggregation) built as batched
device kernels shardable over a TPU mesh.

Layer map (mirrors SURVEY.md §1 of this repo):
  refimpl/   — Python-int oracle (fields, curves, pairing, Pedersen)
  ops/       — JAX/Pallas device kernels (limb field math, curves, MSM, NTT)
  circuit/   — R1CS builder + voting-circuit gadgets
  protocol/  — Groth16, SAVER, marshalling, the six phase functions
  parallel/  — mesh sharding of MSM/NTT/tally (pjit / shard_map)
  chain/     — on-chain layer parity (ballot blob building, contract state)
"""

__version__ = "0.1.0"
