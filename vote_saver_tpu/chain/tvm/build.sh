#!/usr/bin/env bash
# Compile the vote-saver-tpu TVM contracts to deployable .tvc images.
#
# Requires the TON-fork Solidity toolchain (solc with ton-solidity >= 0.30
# support plus tvm_linker), which is not part of this repo's Python/TPU
# environment — run on a machine with the TON toolchain installed, e.g. the
# tonlabs TON-Solidity-Compiler release matching the target FLD cluster.
#
# The behavioural spec for both contracts is the executable simulator
# vote_saver_tpu/chain/contracts.py (tests/test_chain.py); keep the require
# codes and method sets in sync when editing.
set -euo pipefail
cd "$(dirname "$0")"

for c in voting_admin voting_voter; do
    solc "$c.sol"
    tvm_linker compile "$c.code" -o "$c.tvc" --lib stdlib_sol.tvm
done
echo "built: voting_admin.tvc voting_voter.tvc"
