pragma ton-solidity >= 0.30.0;

import "voting_interface.sol";

// SaverVoter — one contract per voter: chunked ballot upload, in-TVM
// VERGRTH16 verification at commit time, and the async admin callback state
// machine.
//
// Normative spec: vote_saver_tpu/chain/contracts.py:SaverVoter (same method
// set and require codes; tests/test_chain.py is the spec test).  The vi blob
// layout and the strict section-offset ordering (in particular the required
// pad byte between ct_end and eid_begin, require 210) are documented in
// chain/ballot_blob.py and docs/WIRE_FORMATS.md.
contract SaverVoter is IVoter {
    // -- storage ---------------------------------------------------------
    address m_current_admin;
    bytes public m_pk;
    bool public m_is_vote_accepted;
    SharedStructs.Ballot public m_ballot;
    int32 m_callback_status; // -1 pending / last admin status otherwise

    constructor(bytes pk, address admin) public {
        require(tvm.pubkey() != 0, 201);
        require(msg.pubkey() == tvm.pubkey(), 202);
        tvm.accept();
        m_pk = pk;
        m_current_admin = admin;
        m_is_vote_accepted = false;
        reset_callback_status();
    }

    // -- access control --------------------------------------------------
    modifier checkOwnerAndAccept {
        require(msg.pubkey() == tvm.pubkey(), 203);
        tvm.accept();
        _;
    }

    modifier checkAdminAndAccept {
        require(msg.sender == m_current_admin, 204);
        tvm.accept();
        _;
    }

    // -- admin binding ----------------------------------------------------
    function update_admin(address new_admin) public checkOwnerAndAccept {
        m_current_admin = new_admin;
        m_is_vote_accepted = false;
    }

    function set_pk(bytes pk) public checkOwnerAndAccept {
        m_pk = pk;
    }

    // -- ballot upload (chunked, resumable) ------------------------------
    function reset_ballot() public checkOwnerAndAccept {
        m_ballot.vi = hex"";
        m_ballot.proof_end = 0;
        m_ballot.ct_begin = 0;
        m_ballot.ct_end = 0;
        m_ballot.eid_begin = 0;
        m_ballot.sn_begin = 0;
        m_ballot.rt_begin = 0;
        reset_callback_status();
        IAdmin(m_current_admin).uncommit_ballot{callback: on_uncommit_ballot}();
    }

    function update_ballot(bytes vi) public checkOwnerAndAccept {
        m_ballot.vi.append(vi);
        reset_callback_status();
        IAdmin(m_current_admin).uncommit_ballot{callback: on_uncommit_ballot}();
    }

    // -- commit: offset ordering + VERGRTH16 + admin registration --------
    function commit_ballot(
        uint32 proof_end, uint32 ct_begin, uint32 ct_end,
        uint32 eid_begin, uint32 sn_begin, uint32 rt_begin
    ) public checkOwnerAndAccept {
        require(m_ballot.vi.length > rt_begin, 207);
        require(rt_begin > sn_begin, 208);
        require(sn_begin > eid_begin, 209);
        // STRICT inequality: one pad byte must sit between the ct section
        // and the eid section (ballot_blob.py emits it; contracts.py:265)
        require(eid_begin > ct_end, 210);
        require(ct_end > ct_begin, 211);
        require(ct_begin > proof_end, 212);

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
            callback: on_check_ballot, value: 200000000
        }(
            m_ballot.vi[eid_begin:sn_begin],
            m_ballot.vi[sn_begin:rt_begin]
        );
    }

    // -- admin callbacks --------------------------------------------------
    function on_uncommit_ballot(int32 result_status) public checkAdminAndAccept {
        if (result_status == 0) {
            m_is_vote_accepted = false;
        }
        m_callback_status = result_status;
    }

    function on_check_ballot(int32 result_status) public checkAdminAndAccept {
        m_is_vote_accepted = (result_status == 0);
        m_callback_status = result_status;
    }

    // -- public getters (section slices of the committed vi) -------------
    function get_pk() public view returns (bytes) {
        tvm.accept();
        return m_pk;
    }

    function get_proof() public view returns (bytes) {
        tvm.accept();
        return m_ballot.vi[1:m_ballot.proof_end]; // skip the mode byte
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
    function get_vi_len() public view checkOwnerAndAccept returns (uint) {
        return m_ballot.vi.length;
    }

    function get_vi() public view checkOwnerAndAccept returns (bytes) {
        return m_ballot.vi;
    }

    function is_vote_accepted() public view checkOwnerAndAccept returns (bool) {
        return m_is_vote_accepted;
    }

    function reset_callback_status() public checkOwnerAndAccept {
        m_callback_status = -1;
    }

    function get_callback_status()
        public view checkOwnerAndAccept returns (int32)
    {
        return m_callback_status;
    }
}
