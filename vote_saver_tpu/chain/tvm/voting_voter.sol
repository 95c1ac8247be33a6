pragma ton-solidity >= 0.30.0;

import "voting_interface.sol";

// SaverVoter — one contract per voter: chunked ballot upload, in-TVM
// VERGRTH16 verification at commit time, and the async admin callback state
// machine.
//
// Provenance: the EXTERNAL surface (function names/signatures, numbered
// require codes, SharedStructs.Ballot layout, the tvm.vergrth16 builtin and
// the responsible-callback wiring) is pinned by wire compatibility with the
// deployed reference contract (reference share/tvm/voting_voter.sol).  The
// implementation bodies are re-derived from this framework's normative
// behavioural spec, vote_saver_tpu/chain/contracts.py:SaverVoter
// (acceptance tests: tests/test_chain.py).  The vi blob layout and the
// strict section-offset ordering (in particular the pad byte between ct_end
// and eid_begin, require 210) are documented in chain/ballot_blob.py and
// docs/WIRE_FORMATS.md.
contract SaverVoter is IVoter {
    // -- storage (contracts.py:SaverVoter.__init__) ----------------------
    address m_current_admin;
    bytes public m_pk;
    bool public m_is_vote_accepted;
    SharedStructs.Ballot public m_ballot;
    int32 m_callback_status; // -1 pending / last admin status otherwise

    // gas budget attached to the check_ballot call so the admin can send
    // the responsible-callback answer back (0.2 ton in nanotons)
    uint128 constant CHECK_BALLOT_VALUE = 200000000;

    constructor(bytes pk, address admin) public {
        require(tvm.pubkey() != 0, 201);
        require(msg.pubkey() == tvm.pubkey(), 202);
        tvm.accept();
        m_pk = pk;
        m_current_admin = admin;
        m_is_vote_accepted = false;
        reset_callback_status();
    }

    // -- access control (contracts.py:_check_owner; admin callbacks) -----
    modifier onlyOwner {
        require(msg.pubkey() == tvm.pubkey(), 203);
        tvm.accept();
        _;
    }

    modifier onlyAdmin {
        require(msg.sender == m_current_admin, 204);
        tvm.accept();
        _;
    }

    // any state-changing voter action invalidates the previous commit on
    // the admin side; shared by reset_ballot / update_ballot
    function _notify_uncommit() private {
        reset_callback_status();
        IAdmin(m_current_admin).uncommit_ballot{
            callback: on_uncommit_ballot
        }();
    }

    // -- admin binding (contracts.py:233-240) ----------------------------
    function update_admin(address new_admin) public onlyOwner {
        m_current_admin = new_admin;
        m_is_vote_accepted = false;
    }

    function set_pk(bytes pk) public onlyOwner {
        m_pk = pk;
    }

    // -- ballot upload: chunked and resumable (contracts.py:244-255) -----
    function reset_ballot() public onlyOwner {
        // zero the whole Ballot struct (blob AND all six section offsets)
        delete m_ballot;
        _notify_uncommit();
    }

    function update_ballot(bytes vi) public onlyOwner {
        m_ballot.vi.append(vi);
        _notify_uncommit();
    }

    // -- commit: offset ordering + VERGRTH16 + admin registration --------
    function commit_ballot(
        uint32 proof_end, uint32 ct_begin, uint32 ct_end,
        uint32 eid_begin, uint32 sn_begin, uint32 rt_begin
    ) public onlyOwner {
        // the six offsets must cut vi into strictly ascending sections:
        //   [1, proof_end) proof < [ct_begin, ct_end) ct < pad byte
        //   < [eid_begin, sn_begin) eid < [sn_begin, rt_begin) sn
        //   < [rt_begin, ...) rt
        // checked end-first with the spec's code ladder (contracts.py:262-
        // 267); 210 is STRICT because exactly one pad byte separates the
        // ct and eid sections (ballot_blob.py emits it)
        require(rt_begin < m_ballot.vi.length, 207);
        require(sn_begin < rt_begin, 208);
        require(eid_begin < sn_begin, 209);
        require(ct_end < eid_begin, 210);
        require(ct_begin < ct_end, 211);
        require(proof_end < ct_begin, 212);

        // Groth16 verification with encrypted primary input, in-TVM; the
        // off-chain equivalent is chain/ballot_blob.vergrth16
        require(tvm.vergrth16(m_ballot.vi), 213);

        m_ballot.proof_end = proof_end;
        m_ballot.ct_begin = ct_begin;
        m_ballot.ct_end = ct_end;
        m_ballot.eid_begin = eid_begin;
        m_ballot.sn_begin = sn_begin;
        m_ballot.rt_begin = rt_begin;

        reset_callback_status();
        IAdmin(m_current_admin).check_ballot{
            callback: on_check_ballot, value: CHECK_BALLOT_VALUE
        }(
            m_ballot.vi[eid_begin:sn_begin],
            m_ballot.vi[sn_begin:rt_begin]
        );
    }

    // -- admin callbacks (contracts.py:315-322) --------------------------
    function on_uncommit_ballot(int32 result_status) public onlyAdmin {
        if (result_status == 0) {
            m_is_vote_accepted = false;
        }
        m_callback_status = result_status;
    }

    function on_check_ballot(int32 result_status) public onlyAdmin {
        m_is_vote_accepted = (result_status == 0);
        m_callback_status = result_status;
    }

    // -- public getters: section slices of the committed vi --------------
    function get_pk() public view returns (bytes) {
        tvm.accept();
        return m_pk;
    }

    function get_proof() public view returns (bytes) {
        tvm.accept();
        return m_ballot.vi[1:m_ballot.proof_end]; // [0] is the mode byte
    }

    function get_ct() public view returns (bytes) {
        tvm.accept();
        return m_ballot.vi[m_ballot.ct_begin:m_ballot.ct_end];
    }

    function get_eid() public view returns (bytes) {
        tvm.accept();
        return m_ballot.vi[m_ballot.eid_begin:m_ballot.sn_begin];
    }

    function get_sn() public view returns (bytes) {
        tvm.accept();
        return m_ballot.vi[m_ballot.sn_begin:m_ballot.rt_begin];
    }

    function get_rt() public view returns (bytes) {
        tvm.accept();
        return m_ballot.vi[m_ballot.rt_begin:];
    }

    // -- owner-only getters ----------------------------------------------
    function get_vi_len() public view onlyOwner returns (uint) {
        return m_ballot.vi.length;
    }

    function get_vi() public view onlyOwner returns (bytes) {
        return m_ballot.vi;
    }

    function is_vote_accepted() public view onlyOwner returns (bool) {
        return m_is_vote_accepted;
    }

    function reset_callback_status() public onlyOwner {
        m_callback_status = -1;
    }

    function get_callback_status() public view onlyOwner returns (int32) {
        return m_callback_status;
    }
}
