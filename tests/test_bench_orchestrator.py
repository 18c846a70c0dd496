"""The four-mode bench orchestrator (bench.py `_run_mode`) must bound a
wedged mode with a hard timeout and survive child failures — relay bad
periods stall every fresh compile 10-20 min (CLAUDE.md trap 9), and one
wedged mode must never cost the driver's headline capture."""

import json
import sys
import textwrap


def _load_bench():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stub(tmp_path, body):
    p = tmp_path / "stub_bench.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_run_mode_success(tmp_path, monkeypatch):
    bench = _load_bench()
    stub = _stub(tmp_path, """
        import json, sys
        print("noise to stderr", file=sys.stderr)
        print(json.dumps({"metric": "m", "value": 12.3}))
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    res = bench._run_mode(["--static"], timeout_s=30)
    assert res == {"metric": "m", "value": 12.3}


def test_run_mode_child_failure(tmp_path, monkeypatch):
    bench = _load_bench()
    stub = _stub(tmp_path, """
        import sys
        sys.exit(3)
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    res = bench._run_mode(["--static"], timeout_s=30)
    assert res["value"] is None and "rc=3" in res["error"]


def test_run_mode_timeout_kills_child(tmp_path, monkeypatch):
    bench = _load_bench()
    stub = _stub(tmp_path, """
        import time
        time.sleep(60)
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    res = bench._run_mode(["--static"], timeout_s=2)
    assert res["value"] is None and "timed out" in res["error"]


def _patch_run_mode(bench, results):
    """Replace _run_mode with a scripted sequence; returns the call log."""
    calls = []
    seq = iter(results)

    def fake(flags, timeout_s):
        calls.append(list(flags))
        return next(seq)

    bench._run_mode = fake
    return calls


def test_eval_mode_no_retry_when_plausible(monkeypatch):
    bench = _load_bench()
    calls = _patch_run_mode(bench, [{"value": 9.0}])
    res = bench._eval_mode(["--static", "--eval"], 10, eval_off_fps=10.9)
    assert res == {"value": 9.0} and len(calls) == 1


def test_eval_mode_retries_relay_stall(monkeypatch):
    # the round-5 artifact case: eval-on 0.587 vs eval-off 9.68
    bench = _load_bench()
    calls = _patch_run_mode(bench, [{"value": 0.587}, {"value": 9.1}])
    res = bench._eval_mode(["--dynamic", "--eval"], 10, eval_off_fps=9.68)
    assert len(calls) == 2
    assert res["value"] == 9.1 and res["retried"] is True
    assert res["first_attempt_fps"] == 0.587


def test_eval_mode_retries_on_failure(monkeypatch):
    bench = _load_bench()
    calls = _patch_run_mode(bench,
                            [{"value": None, "error": "timed out"},
                             {"value": 8.5}])
    res = bench._eval_mode(["--static", "--eval"], 10, eval_off_fps=10.9)
    assert len(calls) == 2 and res["value"] == 8.5


def test_eval_mode_keeps_better_first_attempt(monkeypatch):
    # both attempts slow (a persistent bad period): keep the better one
    bench = _load_bench()
    calls = _patch_run_mode(bench, [{"value": 4.0}, {"value": 3.0}])
    res = bench._eval_mode(["--dynamic", "--eval"], 10, eval_off_fps=9.68)
    assert len(calls) == 2 and res == {"value": 4.0}


def test_eval_mode_no_floor_without_eval_off(monkeypatch):
    # eval-off itself failed (None): any successful eval-on value stands
    bench = _load_bench()
    calls = _patch_run_mode(bench, [{"value": 1.2}])
    res = bench._eval_mode(["--dynamic", "--eval"], 10, eval_off_fps=None)
    assert res == {"value": 1.2} and len(calls) == 1


def test_run_mode_non_json_output(tmp_path, monkeypatch):
    bench = _load_bench()
    stub = _stub(tmp_path, """
        print("not json")
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    res = bench._run_mode(["--static"], timeout_s=30)
    assert res["value"] is None and "no JSON" in res["error"]
