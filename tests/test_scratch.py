"""scratch_root hardening: the per-user staging root must not follow a
pre-planted symlink in the shared temp dir (ADVICE r07: a link
``/tmp/spark_graft_{uid} -> /victim`` would pass a stat-based uid check
while redirecting staged writes — and wipe-on-entry rmtrees — into an
attacker-chosen path), and a pre-existing real root is re-tightened to
0700 (makedirs only applies mode on creation)."""

import os
import tempfile

import pytest

from nlp_data_pipeline_spark import scratch


@pytest.fixture
def fake_tmp(monkeypatch, tmp_path):
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    return tmp_path


def _expected_name(tmp_path):
    return tmp_path / f"spark_graft_{os.getuid()}"


def test_creates_0700_root(fake_tmp):
    root = scratch.scratch_root()
    assert root == str(_expected_name(fake_tmp))
    st = os.lstat(root)
    assert (st.st_mode & 0o777) == 0o700


def test_rejects_planted_symlink(fake_tmp):
    victim = fake_tmp / "victim"
    victim.mkdir()
    os.symlink(victim, _expected_name(fake_tmp))
    with pytest.raises(RuntimeError, match="symlink"):
        scratch.scratch_root()
    # the victim dir must be untouched
    assert victim.is_dir()


def test_rejects_non_directory(fake_tmp):
    _expected_name(fake_tmp).write_text("not a dir")
    with pytest.raises(RuntimeError, match="not a directory"):
        scratch.scratch_root()


def test_retightens_loose_preexisting_root(fake_tmp):
    name = _expected_name(fake_tmp)
    name.mkdir(mode=0o777)
    os.chmod(name, 0o777)  # mkdir mode is masked by umask; force it
    root = scratch.scratch_root()
    assert (os.lstat(root).st_mode & 0o777) == 0o700


def test_scratch_path_stays_under_root(fake_tmp):
    p = scratch.scratch_path("e21_stage")
    assert p == str(_expected_name(fake_tmp) / "e21_stage")
