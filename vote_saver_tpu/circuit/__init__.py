"""R1CS circuit construction: the blueprint-layer replacement.

Replaces crypto3::blueprint (SURVEY.md §2B `blueprint` row): a constraint
system builder plus the gadgets of the `encrypted_input_voting` circuit
(reference common.hpp:849-941,1054-1128) — one-hot vote validity, Pedersen
hashing, Merkle authentication paths, serial-number derivation, multipacking.

Host-side Python builds the (static) constraint tensors once per tree depth;
witness generation is batched over voters with numpy object arrays and the
constraint matrices are exported as COO tensors for device-side evaluation in
the Groth16 prover.
"""
