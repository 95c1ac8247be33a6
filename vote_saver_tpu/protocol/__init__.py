"""Protocol layer: Groth16, SAVER verifiable encryption, marshalling, phases.

The L1 replacement (SURVEY.md §1): same six-phase blob-in/blob-out API as the
reference's common.hpp, with hot paths dispatched to the device kernels in
vote_saver_tpu.ops and verification pairings on the host oracle.
"""
