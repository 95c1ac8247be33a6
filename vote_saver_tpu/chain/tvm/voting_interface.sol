pragma ton-solidity >= 0.30.0;

// vote-saver-tpu on-chain layer: shared types and cross-contract interfaces.
//
// This is the framework's own contract source (not the reference's): the
// normative behavioural spec is the executable simulator
// vote_saver_tpu/chain/contracts.py (method set, require codes, lifecycle),
// which tests/test_chain.py exercises; these sources realise that spec on a
// TON-fork TVM.  ABI-compatible with the reference deployment
// (/root/reference/share/tvm/voting_interface.sol) so the tonos-cli command
// streams emitted by chain/tonos.py work against either.

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

    function cmp_bytes(bytes a, bytes b) public returns (bool) {
        return a.length == b.length && a.toSlice().compare(b.toSlice()) == 0;
    }
}
