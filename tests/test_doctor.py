"""yoho doctor — environment self-check CLI."""

import json

import pytest

from yoho_tpu.cli import doctor

FIXROOT = "tests/fixtures/sessions"


def _run(argv, capsys):
    rc = doctor.main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_doctor_basic_checks_pass(capsys):
    rc, out = _run(["--no-devices"], capsys)
    assert rc == 0
    assert "package" in out and "dep:jax" in out
    assert "all checks passed" in out


def test_doctor_json_mode(capsys):
    rc, out = _run(["--no-devices", "--json"], capsys)
    assert rc == 0
    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert all({"check", "status", "detail"} <= set(r) for r in rows)
    assert any(r["check"] == "native:core" for r in rows)


def test_doctor_session_fixture(capsys):
    rc, out = _run(["--no-devices", "--session", "tiny",
                    "--root", FIXROOT], capsys)
    assert rc == 0
    assert "session:weights.tokenizer" in out
    assert "session:weights.asr" in out


def test_doctor_session_missing(capsys):
    rc, out = _run(["--no-devices", "--session", "nope",
                    "--root", FIXROOT], capsys)
    assert rc == 1
    assert "FAIL" in out


def test_doctor_hf_dir(tmp_path, capsys):
    # Complete checkpoint dir: weights + config + tokenizer files.
    (tmp_path / "model.safetensors").write_bytes(b"x")
    (tmp_path / "config.json").write_text("{}")
    (tmp_path / "tokenizer.json").write_text("{}")
    rc, out = _run(["--no-devices", "--hf", str(tmp_path)], capsys)
    assert rc == 0
    assert "hf:weights" in out and "hf:tokenizer" in out


def test_doctor_hf_missing_weights(tmp_path, capsys):
    (tmp_path / "config.json").write_text("{}")
    rc, out = _run(["--no-devices", "--hf", str(tmp_path)], capsys)
    assert rc == 1  # no weights = hard failure


def test_doctor_hf_missing_tokenizer_warns_only(tmp_path, capsys):
    (tmp_path / "model.safetensors").write_bytes(b"x")
    (tmp_path / "config.json").write_text("{}")
    rc, out = _run(["--no-devices", "--hf", str(tmp_path)], capsys)
    assert rc == 0  # ids-only transcripts: warn, not fail
    assert "warn" in out


def test_doctor_hf_not_a_dir(tmp_path, capsys):
    rc, out = _run(["--no-devices", "--hf", str(tmp_path / "absent")],
                   capsys)
    assert rc == 1


def test_doctor_device_probe_times_out(monkeypatch, capsys):
    """A wedged backend (probe never returns) is a diagnosed FAIL, not a
    hang: fake the subprocess layer raising TimeoutExpired."""
    import subprocess

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])

    monkeypatch.setattr(doctor.subprocess, "run", fake_run)
    rc, out = _run(["--device-timeout", "1"], capsys)
    assert rc == 1
    assert "wedged" in out


def test_doctor_umbrella_registration():
    from yoho_tpu.cli.__main__ import COMMANDS

    assert COMMANDS["doctor"][0] == "yoho_tpu.cli.doctor"
