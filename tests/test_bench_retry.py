"""Init-retry armor for the bench entry points (utils/bench_retry.py).

Round-4 post-mortem coverage: a transient device-init hang must be
retried with backoff instead of voiding the artifact, real measurement
failures must NOT be retried, and the final JSON must carry `retries` +
a per-attempt log. Children here are fake scripts that hang or fail on
early invocations — no device, no jax.
"""

import json
import sys
import textwrap

import pytest

from fft_restoration_tpu.utils.bench_retry import (
    is_init_failure,
    supervise,
)


def _fake_child(tmp_path, body: str) -> list:
    """Write a fake bench child whose behavior depends on an attempt
    counter persisted in a side file (the supervisor re-runs it)."""
    script = tmp_path / "fake_bench.py"
    counter = tmp_path / "attempts.txt"
    script.write_text(
        textwrap.dedent(
            f"""
            import json, os, sys, time
            assert os.environ.get("FFT_BENCH_CHILD") == "1"
            p = {str(counter)!r}
            n = int(open(p).read()) if os.path.exists(p) else 0
            open(p, "w").write(str(n + 1))
            """
        )
        + textwrap.dedent(body)
    )
    return [sys.executable, str(script)]


def _sup(argv, capsys, **kw):
    kw.setdefault("sleep", lambda s: None)
    kw.setdefault("attempt_cap_s", 20.0)
    rc = supervise(argv, **kw)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, [json.loads(x) for x in out if x.strip()]


def test_init_hang_then_success_is_retried(tmp_path, capsys):
    # Attempt 1 mimics devwatch: init-failure record + exit 2.
    # Attempt 2 succeeds with a real number.
    argv = _fake_child(
        tmp_path,
        """
        if n == 0:
            print(json.dumps({"metric": "m", "value": None,
                "error": "device initialization did not complete within 300 s"}))
            sys.exit(2)
        print("backend: pallas (human line)")
        print(json.dumps({"metric": "m", "value": 13578.0, "unit": "MP/s"}))
        """,
    )
    rc, recs = _sup(argv, capsys)
    assert rc == 0
    (rec,) = recs
    assert rec["value"] == 13578.0
    assert rec["retries"] == 1
    assert [a["outcome"] for a in rec["attempts"]] == ["init-timeout", "ok"]


def test_hard_capped_hang_is_retried(tmp_path, capsys):
    # Attempt 1 wedges with no output at all (the devwatch-missed case);
    # the supervisor's hard cap kills it and retries.
    argv = _fake_child(
        tmp_path,
        """
        if n == 0:
            time.sleep(60)
        print(json.dumps({"metric": "m", "value": 1.0}))
        """,
    )
    rc, recs = _sup(argv, capsys, attempt_cap_s=2.0)
    assert rc == 0
    (rec,) = recs
    assert rec["value"] == 1.0
    assert rec["retries"] == 1
    assert rec["attempts"][0]["outcome"] == "init-timeout"


def test_measurement_failure_is_not_retried(tmp_path, capsys):
    # A qualified failure (contended pool, compile budget) carries
    # information — re-running would burn the budget for nothing.
    argv = _fake_child(
        tmp_path,
        """
        print(json.dumps({"metric": "m", "value": None,
            "error": "no backend completed a warm run within the alarm budget"}))
        sys.exit(1)
        """,
    )
    rc, recs = _sup(argv, capsys)
    assert rc == 1
    (rec,) = recs
    assert rec["retries"] == 0
    assert len(rec["attempts"]) == 1
    assert rec["attempts"][0]["outcome"] == "failed"


def test_attempts_exhausted_emits_last_record(tmp_path, capsys):
    argv = _fake_child(
        tmp_path,
        """
        print(json.dumps({"metric": "m", "value": None,
            "error": "device initialization did not complete within 300 s"}))
        sys.exit(2)
        """,
    )
    rc, recs = _sup(argv, capsys, attempts=3)
    assert rc == 2
    (rec,) = recs
    assert rec["value"] is None
    assert rec["retries"] == 2
    assert [a["outcome"] for a in rec["attempts"]] == ["init-timeout"] * 3


def test_retry_budget_bounds_the_loop(tmp_path, capsys):
    argv = _fake_child(
        tmp_path,
        """
        print(json.dumps({"metric": "m", "value": None,
            "error": "device initialization did not complete within 300 s"}))
        sys.exit(2)
        """,
    )
    # Zero budget: the first failure may not be retried at all.
    rc, recs = _sup(argv, capsys, attempts=3, retry_budget_s=0.0)
    assert rc == 2
    assert len(recs[0]["attempts"]) == 1


def test_passthrough_reemits_all_lines(tmp_path, capsys):
    # bench_extended prints one JSON line PER CONFIG.
    argv = _fake_child(
        tmp_path,
        """
        if n == 0:
            print(json.dumps({"value": None,
                "error": "pool unreachable (no response in 300 s)"}))
            sys.exit(2)
        print(json.dumps({"config": "cat", "value": 1.0}))
        print(json.dumps({"config": "car", "value": 2.0}))
        """,
    )
    rc, recs = _sup(argv, capsys, passthrough=True)
    assert rc == 0
    assert [r.get("config") for r in recs[:2]] == ["cat", "car"]
    # a retry happened, so the trailing bench_retry record is appended
    assert recs[-1]["metric"] == "bench_retry"
    assert recs[-1]["retries"] == 1


def test_passthrough_clean_run_adds_no_record(tmp_path, capsys):
    argv = _fake_child(
        tmp_path,
        """
        print(json.dumps({"config": "cat", "value": 1.0}))
        """,
    )
    rc, recs = _sup(argv, capsys, passthrough=True)
    assert rc == 0
    assert len(recs) == 1 and recs[0]["config"] == "cat"


@pytest.mark.parametrize(
    "record,rc,expect",
    [
        (None, -9, True),  # hard-capped hang, nothing emitted
        ({"error": "device initialization did not complete"}, 2, True),
        ({"error": "pool unreachable (no response in 300 s)"}, 2, True),
        ({"error": "no backend completed a warm run"}, 1, False),
        ({"value": 3.0}, 0, False),
    ],
)
def test_is_init_failure_classifier(record, rc, expect):
    assert is_init_failure(record, rc) is expect


def test_bench_entry_points_are_wired():
    # The armor only helps if the drivers actually route through it.
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    for rel in ("bench.py", "bench_extended.py", "tools/quiet_probe.py"):
        assert "main_with_retries" in (root / rel).read_text(), rel
