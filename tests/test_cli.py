"""CLI surface tests (cheap paths; the full --phase all flow is exercised in
the verification runs and scripts/run_election.py)."""

import pytest

from vote_saver_tpu import cli


def test_init_voter_writes_idempotent_artifacts(tmp_path):
    cli.main(["--phase", "init_voter", "--tree-depth", "1", "--seed", "3",
              "--workdir", str(tmp_path)])
    pk0 = (tmp_path / "voter_public_key0.bin").read_bytes()
    assert len(pk0) == 32
    # skip-if-exists semantics (write_obj, reference main.cpp:362-366)
    cli.main(["--phase", "init_voter", "--tree-depth", "1", "--seed", "4",
              "--workdir", str(tmp_path)])
    assert (tmp_path / "voter_public_key0.bin").read_bytes() == pk0


def test_missing_artifacts_fail_cleanly(tmp_path):
    with pytest.raises(AssertionError, match="doesn't exist"):
        cli.main(["--phase", "vote", "--workdir", str(tmp_path)])
    with pytest.raises(AssertionError, match="no ciphertexts"):
        cli.main(["--phase", "tally_admin", "--workdir", str(tmp_path)])


def test_vote_count_mismatch_rejected(tmp_path):
    with pytest.raises(AssertionError, match="--vote count"):
        cli.main(["--phase", "vote", "--voter-idx", "0", "1", "--vote", "2",
                  "--workdir", str(tmp_path)])
