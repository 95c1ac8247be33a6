pragma ton-solidity >= 0.30.0;

import "voting_interface.sol";

// SaverAdmin — the election administrator's on-chain state machine.
//
// Provenance: the EXTERNAL surface (function names/signatures, numbered
// require codes, the SharedStructs layouts and the responsible-callback
// return idiom) is pinned by wire compatibility with the deployed reference
// contract (reference share/tvm/voting_admin.sol) — clients and the voter
// contract address this ABI.  The implementation bodies are re-derived from
// this framework's normative behavioural spec,
// vote_saver_tpu/chain/contracts.py:SaverAdmin, whose acceptance tests are
// tests/test_chain.py.
//
// Lifecycle: chunked CRS upload -> reset_context -> set_eid / set_rt /
// add_voters -> init_voting_session -> per-voter check_ballot callbacks ->
// chunked tally upload -> commit_tally.  A ballot is rejected when its eid
// differs from the session's (status 1) or its serial number was already
// accepted (status 2, the double-vote guard); eid reuse across sessions is
// refused outright (require 107).
contract SaverAdmin is IAdmin {
    // -- storage (contracts.py:SaverAdmin.__init__) ----------------------
    bytes public m_eid;
    bytes[] public m_crs_pk;
    bytes[] public m_crs_vk;
    SharedStructs.SessionState public m_session_state;
    mapping(bytes => optional(bool)) m_all_eid; // every eid ever session'd
    mapping(bytes => optional(bool)) m_all_sn;  // every accepted serial no.
    uint32 m_voter_msg_accepted;  // last voter message: 1 check, 2 uncommit
    bool m_is_tally_committed;
    bool m_is_session_initialized;

    constructor() public {
        require(tvm.pubkey() != 0, 101);
        require(msg.pubkey() == tvm.pubkey(), 102);
        tvm.accept();
        reset_voter_msg_accepted();
    }

    // -- access control (contracts.py:_check_owner/_check_not_initialized)
    modifier onlyOwner {
        require(msg.pubkey() == tvm.pubkey(), 103);
        tvm.accept();
        _;
    }

    modifier onlyRegisteredVoter {
        require(m_session_state.voter_map_accepted.exists(msg.sender), 104);
        tvm.accept();
        _;
    }

    modifier onlySetupPhase() {
        require(!m_is_session_initialized, 105);
        _;
    }

    // -- CRS upload: chunked and resumable (contracts.py:70-84) ----------
    function update_crs_pk(bytes pk) public onlyOwner {
        reset_context();
        m_crs_pk.push(pk);
    }

    function update_crs_vk(bytes vk) public onlyOwner {
        reset_context();
        m_crs_vk.push(vk);
    }

    function reset_crs() public onlyOwner {
        reset_context();
        delete m_crs_pk;
        delete m_crs_vk;
    }

    // -- session lifecycle (contracts.py:88-124) -------------------------
    function reset_context() public onlyOwner {
        // deleting the struct / maps resets every member to its zero state
        // (fresh SessionState(), empty eid/sn history in the Python spec)
        delete m_session_state;
        delete m_eid;
        delete m_all_eid;
        delete m_all_sn;
        m_is_tally_committed = false;
        m_is_session_initialized = false;
    }

    function set_eid(bytes eid, bytes pk_eid, bytes vk_eid)
        public onlyOwner onlySetupPhase
    {
        // add() returns false when the key already exists: an election with
        // this eid has run before, so refuse the replay
        require(m_all_eid.add(eid, null), 107);
        m_eid = eid;
        m_session_state.pk_eid = pk_eid;
        m_session_state.vk_eid = vk_eid;
    }

    function set_rt(bytes rt) public onlyOwner onlySetupPhase {
        m_session_state.rt = rt;
    }

    function add_voters(address[] voters_addresses)
        public onlyOwner onlySetupPhase
    {
        uint count = voters_addresses.length;
        for (uint i = 0; i < count; ++i) {
            address voter = voters_addresses[i];
            m_session_state.voters_addresses.push(voter);
            m_session_state.voter_map_accepted.add(voter, false);
        }
        m_session_state.voters_number += count;
    }

    function init_voting_session() public onlyOwner onlySetupPhase {
        require(m_session_state.voters_addresses.length > 0, 106);
        m_is_tally_committed = false;
        m_is_session_initialized = true;
    }

    // -- ballot acceptance (contracts.py:128-145) ------------------------
    // Classification of an incoming ballot, separated from the state
    // mutation: 0 accepted / 1 wrong session eid / 2 sn replay.  Note the
    // sn-history insertion only happens once the eid matched (the spec's
    // short-circuit order in contracts.py:check_ballot).
    function classify_ballot(bytes eid, bytes sn) private returns (int32) {
        if (!SharedStructs.cmp_bytes(m_eid, eid)) {
            return 1;
        }
        if (!m_all_sn.add(sn, null)) {
            return 2;
        }
        return 0;
    }

    function check_ballot(bytes eid, bytes sn)
        external onlyRegisteredVoter responsible override returns (int32)
    {
        m_voter_msg_accepted = 1;
        int32 result_status = classify_ballot(eid, sn);
        m_session_state.voter_map_accepted.replace(
            msg.sender, result_status == 0
        );
        return {value: 0, bounce: false, flag: 64} result_status;
    }

    function uncommit_ballot()
        external onlyRegisteredVoter responsible override returns (int32)
    {
        m_voter_msg_accepted = 2;
        m_session_state.voter_map_accepted.replace(msg.sender, false);
        return {value: 0, bounce: false, flag: 64} 0;
    }

    // -- tally upload, chunked (contracts.py:149-173) --------------------
    function reset_tally() public onlyOwner {
        m_is_tally_committed = false;
        delete m_session_state.ct_sum;
        delete m_session_state.m_sum;
        delete m_session_state.dec_proof;
    }

    function update_tally_ct_sum(bytes ct_sum) public onlyOwner {
        m_is_tally_committed = false;
        m_session_state.ct_sum.push(ct_sum);
    }

    function update_tally_m_sum(bytes m_sum) public onlyOwner {
        m_is_tally_committed = false;
        m_session_state.m_sum.push(m_sum);
    }

    function update_tally_dec_proof(bytes dec_proof) public onlyOwner {
        m_is_tally_committed = false;
        m_session_state.dec_proof.push(dec_proof);
    }

    function commit_tally() public onlyOwner {
        m_is_tally_committed = true;
    }

    // -- public getters (contracts.py:177-213; bodies are forced by the
    //    one-storage-read shape of each accessor) ------------------------
    function get_crs_pk() public view returns (bytes[]) { return m_crs_pk; }
    function get_crs_vk() public view returns (bytes[]) { return m_crs_vk; }

    function get_voters_addresses() public view returns (address[]) {
        return m_session_state.voters_addresses;
    }

    function get_pk_eid() public view returns (bytes) {
        return m_session_state.pk_eid;
    }

    function get_vk_eid() public view returns (bytes) {
        return m_session_state.vk_eid;
    }

    function get_eid() public view returns (bytes) { return m_eid; }
    function get_rt() public view returns (bytes) { return m_session_state.rt; }

    function get_m_is_tally_committed() public view returns (bool) {
        return m_is_tally_committed;
    }

    function get_ct_sum() public view returns (bytes[]) {
        return m_session_state.ct_sum;
    }

    function get_m_sum() public view returns (bytes[]) {
        return m_session_state.m_sum;
    }

    function get_dec_proof() public view returns (bytes[]) {
        return m_session_state.dec_proof;
    }

    // -- owner-only getters ----------------------------------------------
    function get_voter_status(address voter_addr)
        public view onlyOwner returns (bool)
    {
        require(m_session_state.voter_map_accepted.exists(voter_addr), 108);
        return m_session_state.voter_map_accepted.at(voter_addr);
    }

    function get_voters_statuses()
        public view onlyOwner returns (mapping(address => bool))
    {
        return m_session_state.voter_map_accepted;
    }

    function reset_voter_msg_accepted() public onlyOwner {
        m_voter_msg_accepted = 0;
    }

    function get_voter_msg_accepted() public view onlyOwner returns (uint32) {
        return m_voter_msg_accepted;
    }

    function get_is_tally_committed() public view onlyOwner returns (bool) {
        return m_is_tally_committed;
    }
}
