"""bench.py failure reporting (VERDICT r3 weak #6): a crashed batch point
must surface in the emitted JSON as errors_by_batch, and a run where fewer
than two points survive must carry a top-level error field."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _run_main(monkeypatch, capsys, fake_measure):
    monkeypatch.setattr(bench, "measure", fake_measure)
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "_extra_metrics", lambda best: {})
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_batch_point_failure_is_recorded(monkeypatch, capsys):
    def fake(b, **kw):
        if b == 8:
            raise RuntimeError("synthetic OOM")
        return 100.0 * b

    result = _run_main(monkeypatch, capsys, fake)
    assert result["errors_by_batch"] == {"8": "RuntimeError: synthetic OOM"}
    assert set(result["rates_by_batch"]) == {"1", "4", "16"}
    assert "error" not in result


def test_single_surviving_point_flags_headline(monkeypatch, capsys):
    def fake(b, **kw):
        if b != 1:
            raise RuntimeError("boom")
        return 42.0

    result = _run_main(monkeypatch, capsys, fake)
    assert set(result["errors_by_batch"]) == {"4", "8", "16"}
    assert "not trustworthy" in result["error"]
    assert result["value"] == 42.0
