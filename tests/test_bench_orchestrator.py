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


def test_run_mode_non_json_output(tmp_path, monkeypatch):
    bench = _load_bench()
    stub = _stub(tmp_path, """
        print("not json")
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    res = bench._run_mode(["--static"], timeout_s=30)
    assert res["value"] is None and "no JSON" in res["error"]
