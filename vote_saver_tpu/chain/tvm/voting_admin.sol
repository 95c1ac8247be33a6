pragma ton-solidity >= 0.30.0;

import "voting_interface.sol";

// SaverAdmin — the election administrator's on-chain state machine.
//
// Normative spec: vote_saver_tpu/chain/contracts.py:SaverAdmin (same method
// set and numbered require codes; tests/test_chain.py is the spec test).
// Lifecycle: upload CRS in chunks -> reset_context -> set_eid / set_rt /
// add_voters -> init_voting_session -> per-voter check_ballot callbacks ->
// chunked tally upload -> commit_tally.  Double votes are rejected by the
// m_all_sn serial-number map; eid replay across sessions by m_all_eid.
contract SaverAdmin is IAdmin {
    // -- storage ---------------------------------------------------------
    bytes public m_eid;
    bytes[] public m_crs_pk;
    bytes[] public m_crs_vk;
    SharedStructs.SessionState public m_session_state;
    mapping(bytes => optional(bool)) m_all_eid; // every eid ever used
    mapping(bytes => optional(bool)) m_all_sn;  // every sn ever accepted
    uint32 m_voter_msg_accepted;                // 0 none / 1 check / 2 uncommit
    bool m_is_tally_committed;
    bool m_is_session_initialized;

    constructor() public {
        require(tvm.pubkey() != 0, 101);
        require(msg.pubkey() == tvm.pubkey(), 102);
        tvm.accept();
        reset_voter_msg_accepted();
    }

    // -- access control --------------------------------------------------
    modifier checkOwnerAndAccept {
        require(msg.pubkey() == tvm.pubkey(), 103);
        tvm.accept();
        _;
    }

    modifier checkSenderIsVoter {
        require(m_session_state.voter_map_accepted.exists(msg.sender), 104);
        tvm.accept();
        _;
    }

    modifier checkVotingSessionIsNotInitialized() {
        require(!m_is_session_initialized, 105);
        _;
    }

    // -- CRS upload (chunked, resumable) ---------------------------------
    function update_crs_pk(bytes pk) public checkOwnerAndAccept {
        reset_context();
        m_crs_pk.push(pk);
    }

    function update_crs_vk(bytes vk) public checkOwnerAndAccept {
        reset_context();
        m_crs_vk.push(vk);
    }

    function reset_crs() public checkOwnerAndAccept {
        reset_context();
        m_crs_pk = new bytes[](0);
        m_crs_vk = new bytes[](0);
    }

    // -- session lifecycle ------------------------------------------------
    function reset_context() public checkOwnerAndAccept {
        m_is_tally_committed = false;

        m_session_state.voters_number = 0;
        m_session_state.pk_eid = hex"";
        m_session_state.vk_eid = hex"";
        m_session_state.rt = hex"";
        mapping(address => bool) fresh_accepted;
        m_session_state.voter_map_accepted = fresh_accepted;
        address[] fresh_addresses;
        m_session_state.voters_addresses = fresh_addresses;

        m_eid = hex"";
        mapping(bytes => optional(bool)) fresh_eids;
        m_all_eid = fresh_eids;
        mapping(bytes => optional(bool)) fresh_sns;
        m_all_sn = fresh_sns;

        m_is_session_initialized = false;
    }

    function set_eid(bytes eid, bytes pk_eid, bytes vk_eid)
        public checkOwnerAndAccept checkVotingSessionIsNotInitialized
    {
        // a session with this eid already ran: replay rejection
        require(m_all_eid.add(eid, null), 107);
        m_eid = eid;
        m_session_state.pk_eid = pk_eid;
        m_session_state.vk_eid = vk_eid;
    }

    function set_rt(bytes rt)
        public checkOwnerAndAccept checkVotingSessionIsNotInitialized
    {
        m_session_state.rt = rt;
    }

    function add_voters(address[] voters_addresses)
        public checkOwnerAndAccept checkVotingSessionIsNotInitialized
    {
        for (uint i = 0; i < voters_addresses.length; i++) {
            m_session_state.voters_addresses.push(voters_addresses[i]);
            m_session_state.voter_map_accepted.add(voters_addresses[i], false);
        }
        m_session_state.voters_number += voters_addresses.length;
    }

    function init_voting_session()
        public checkOwnerAndAccept checkVotingSessionIsNotInitialized
    {
        require(m_session_state.voters_addresses.length > 0, 106);
        m_is_tally_committed = false;
        m_is_session_initialized = true;
    }

    // -- ballot acceptance (called by SaverVoter.commit_ballot) ----------
    function check_ballot(bytes eid, bytes sn)
        external checkSenderIsVoter responsible override returns (int32)
    {
        m_voter_msg_accepted = 1;
        int32 result_status = 0;
        if (!SharedStructs.cmp_bytes(m_eid, eid)) {
            m_session_state.voter_map_accepted.replace(msg.sender, false);
            result_status = 1; // ballot carries a different session eid
        } else if (!m_all_sn.add(sn, null)) {
            m_session_state.voter_map_accepted.replace(msg.sender, false);
            result_status = 2; // sn seen before: double vote
        } else {
            m_session_state.voter_map_accepted.replace(msg.sender, true);
        }
        return {value: 0, bounce: false, flag: 64} result_status;
    }

    function uncommit_ballot()
        external checkSenderIsVoter responsible override returns (int32)
    {
        m_voter_msg_accepted = 2;
        m_session_state.voter_map_accepted.replace(msg.sender, false);
        return {value: 0, bounce: false, flag: 64} 0;
    }

    // -- tally upload (chunked) ------------------------------------------
    function reset_tally() public checkOwnerAndAccept {
        m_is_tally_committed = false;
        m_session_state.ct_sum = new bytes[](0);
        m_session_state.m_sum = new bytes[](0);
        m_session_state.dec_proof = new bytes[](0);
    }

    function update_tally_ct_sum(bytes ct_sum) public checkOwnerAndAccept {
        m_is_tally_committed = false;
        m_session_state.ct_sum.push(ct_sum);
    }

    function update_tally_m_sum(bytes m_sum) public checkOwnerAndAccept {
        m_is_tally_committed = false;
        m_session_state.m_sum.push(m_sum);
    }

    function update_tally_dec_proof(bytes dec_proof) public checkOwnerAndAccept {
        m_is_tally_committed = false;
        m_session_state.dec_proof.push(dec_proof);
    }

    function commit_tally() public checkOwnerAndAccept {
        m_is_tally_committed = true;
    }

    // -- public getters ---------------------------------------------------
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
        public view checkOwnerAndAccept returns (bool)
    {
        require(m_session_state.voter_map_accepted.exists(voter_addr), 108);
        return m_session_state.voter_map_accepted.at(voter_addr);
    }

    function get_voters_statuses()
        public view checkOwnerAndAccept returns (mapping(address => bool))
    {
        return m_session_state.voter_map_accepted;
    }

    function reset_voter_msg_accepted() public checkOwnerAndAccept {
        m_voter_msg_accepted = 0;
    }

    function get_voter_msg_accepted()
        public view checkOwnerAndAccept returns (uint32)
    {
        return m_voter_msg_accepted;
    }

    function get_is_tally_committed()
        public view checkOwnerAndAccept returns (bool)
    {
        return m_is_tally_committed;
    }
}
