"""bench.py's torch baselines: row-chunked == fused (math identity).

The uncapped bench graph forces the torch f64 baseline to chunk its dense
per-row feature work (host RAM); the chunked path must reproduce the fused
loss and parameter trajectory exactly, or the measured baseline would be a
different objective.
"""
import numpy as np
import pytest

import bench


def _tiny_data():
    import __graft_entry__ as ge

    cfg, data, _model = ge._tiny_setup()
    return cfg, data


def test_torch_baseline_chunked_matches_fused(monkeypatch):
    torch = pytest.importorskip("torch")
    cfg, data = _tiny_data()

    _, loss0_f, w_f = bench.bench_torch_baseline(cfg, data, steps=3)
    monkeypatch.setattr(bench, "TORCH_PAIRS_CHUNK", 512)
    _, loss0_c, w_c = bench.bench_torch_baseline(cfg, data, steps=3)
    np.testing.assert_allclose(loss0_c, loss0_f, rtol=1e-12)
    np.testing.assert_allclose(w_c, w_f, rtol=1e-10)


def test_torch_baseline_full_rows_chunked(monkeypatch):
    torch = pytest.importorskip("torch")
    cfg, data = _tiny_data()
    full_nn = data.neighbors[0]

    _, loss0_f, w_f = bench.bench_torch_baseline(
        cfg, data, steps=2, full_nn=full_nn
    )
    monkeypatch.setattr(bench, "TORCH_PAIRS_CHUNK", 512)
    _, loss0_c, w_c = bench.bench_torch_baseline(
        cfg, data, steps=2, full_nn=full_nn
    )
    np.testing.assert_allclose(loss0_c, loss0_f, rtol=1e-12)
    np.testing.assert_allclose(w_c, w_f, rtol=1e-10)
