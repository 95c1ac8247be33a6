pragma ton-solidity >= 0.30.0;

// vote-saver-tpu on-chain layer: shared types and cross-contract interfaces.
//
// Provenance: the declarations in THIS file are the on-chain ABI — the
// interface signatures, struct member names/types/order, and the
// responsible-call status codes are all pinned by wire compatibility with
// the reference deployment (reference share/tvm/voting_interface.sol), so
// they necessarily coincide with it declaration-for-declaration.  The
// normative behavioural spec the contract BODIES are derived from is the
// executable simulator vote_saver_tpu/chain/contracts.py (exercised by
// tests/test_chain.py); the tonos-cli command streams emitted by
// chain/tonos.py work against either deployment.

interface IVoter {
}

interface IAdmin {
    // Voter -> admin ballot registration: (eid slice, sn slice) of the
    // committed vi blob.  Responsible: the admin answers through the
    // caller-supplied callback with a status int32
    // (0 = accepted, 1 = wrong session eid, 2 = sn replay / double vote).
    function check_ballot(bytes, bytes) external responsible returns (int32);

    // Voter -> admin withdrawal (ballot edited or reset); always status 0.
    function uncommit_ballot() external responsible returns (int32);
}

library SharedStructs {
    struct CRS {
        bytes pk;
        bytes vk;
    }

    // One committed ballot: the raw VERGRTH16 input blob plus the section
    // offsets the voter declared at commit time (layout per
    // docs/WIRE_FORMATS.md "on-chain vi blob"; worked offsets in the
    // reference README.md:219).
    struct Ballot {
        bytes vi;
        uint32 proof_end;
        uint32 ct_begin;
        uint32 ct_end;
        uint32 eid_begin;
        uint32 sn_begin;
        uint32 rt_begin;
    }

    // Per-session admin state (chain/contracts.py:SessionState).
    struct SessionState {
        uint voters_number;
        bytes pk_eid;
        bytes vk_eid;
        address[] voters_addresses;
        mapping(address => bool) voter_map_accepted;
        bytes rt;
        bytes[] ct_sum;
        bytes[] m_sum;
        bytes[] dec_proof;
    }

    // byte-string equality (TVM slices compare lexicographically; unequal
    // lengths can never be equal, so test that first and cheaply)
    function cmp_bytes(bytes a, bytes b) public returns (bool) {
        if (a.length != b.length) {
            return false;
        }
        return a.toSlice().compare(b.toSlice()) == 0;
    }
}
