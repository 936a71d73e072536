import json

import numpy as np
import pandas as pd
import pytest

from kir_graph_tpu.cn import (
    CNgroup,
    KDEcut,
    aggrDepths,
    depthToCN,
    loadCN,
    loadCNModel,
    predictSamplesCN,
)


def makeDepths(rng, cn_per_gene, base=30.0, noise=1.5):
    return {
        gene: float(max(0.0, cn * base / 2 + rng.normal(0, noise)))
        for gene, cn in cn_per_gene.items()
    }


@pytest.fixture
def truth():
    return {
        "KIR3DL3*BACKBONE": 2,
        "KIR2DL1*BACKBONE": 2,
        "KIR2DL2*BACKBONE": 1,
        "KIR2DL3*BACKBONE": 3,
        "KIR2DS4*BACKBONE": 0,
        "KIR3DL2*BACKBONE": 2,
        "KIR2DL4*BACKBONE": 1,
        "KIR3DP1*BACKBONE": 4,
    }


def test_cngroup_fit_assign(truth):
    rng = np.random.Generator(np.random.Philox(0))
    depths = makeDepths(rng, truth)
    cns, model = depthToCN([depths], assume_3DL3_diploid=True)
    assert cns[0] == truth
    assert isinstance(model, CNgroup)
    # CN=1 mean should be near base/2 = 15
    assert 12 < model.base < 18


def test_cngroup_cohort_pooling(truth):
    rng = np.random.Generator(np.random.Philox(1))
    samples = [makeDepths(rng, truth) for _ in range(8)]
    cns, model = depthToCN(samples, assume_3DL3_diploid=False)
    assert all(cn == truth for cn in cns)


def test_cngroup_start_base_2(truth):
    rng = np.random.Generator(np.random.Philox(2))
    depths = makeDepths(rng, truth)
    cns, model = depthToCN(
        [depths],
        cluster_method_kwargs={"start_base": 2, "base_dev": 0.08},
        assume_3DL3_diploid=True,
    )
    assert cns[0] == truth


def test_cngroup_json_roundtrip(tmp_path, truth):
    rng = np.random.Generator(np.random.Philox(3))
    cns, model = depthToCN([makeDepths(rng, truth)])
    fn = str(tmp_path / "model.json")
    model.save(fn)
    loaded = loadCNModel(fn)
    assert isinstance(loaded, CNgroup)
    assert loaded.base == model.base
    vals = [0.0, 15.0, 30.0, 45.0]
    assert loaded.assignCN(vals) == model.assignCN(vals)


def test_kde_fit_assign(truth):
    rng = np.random.Generator(np.random.Philox(4))
    # KDE needs a decent number of points per cluster
    samples = [makeDepths(rng, truth, noise=1.0) for _ in range(20)]
    cns, model = depthToCN(samples, cluster_method="kde")
    assert isinstance(model, KDEcut)
    # thresholds must separate the CN clusters monotonically
    assert all(cn == truth for cn in cns)


def test_kde_json_roundtrip(tmp_path, truth):
    rng = np.random.Generator(np.random.Philox(5))
    samples = [makeDepths(rng, truth) for _ in range(20)]
    _, model = depthToCN(samples, cluster_method="kde")
    fn = str(tmp_path / "kde.json")
    model.save(fn)
    loaded = loadCNModel(fn)
    assert loaded.assignCN([1.0, 20.0, 31.0]) == model.assignCN([1.0, 20.0, 31.0])


def test_aggr_depths_p75():
    df = pd.DataFrame(
        {
            "gene": ["g1"] * 4 + ["g2"] * 4,
            "pos": list(range(4)) * 2,
            "depth": [10, 20, 30, 40, 1, 1, 1, 100],
        }
    )
    out = aggrDepths(df, "p75")
    assert out[out["gene"] == "g1"]["depth"].iloc[0] == 32.5
    assert aggrDepths(df, "mean")[lambda d: d["gene"] == "g1"]["depth"].iloc[0] == 25


def test_predict_samples_cn_files(tmp_path, truth):
    rng = np.random.Generator(np.random.Philox(6))
    depth_files, cn_files = [], []
    for s in range(3):
        depths = makeDepths(rng, truth)
        rows = []
        for gene, d in depths.items():
            for pos in range(50):
                rows.append((gene, pos + 1, max(0.0, d + rng.normal(0, 0.5))))
        fn = str(tmp_path / f"s{s}.depth.tsv")
        pd.DataFrame(rows).to_csv(fn, sep="\t", header=False, index=False)
        depth_files.append(fn)
        cn_files.append(str(tmp_path / f"s{s}.cn.tsv"))

    predictSamplesCN(
        depth_files,
        cn_files,
        assume_3DL3_diploid=False,
        save_cn_model_path=str(tmp_path / "model.json"),
    )
    for fn in cn_files:
        cn = loadCN(fn)
        assert cn == truth
    assert (tmp_path / "model.json").exists()


def test_cn_venue_host_matches_device(monkeypatch):
    """numpy CN twins vs jitted kernels: same base, same assignments
    (KGT_CN_DEVICE=1 forces the device path)."""
    import numpy as np

    from kir_graph_tpu.cn.models import CNgroup, KDEcut

    rng = np.random.Generator(np.random.Philox(7))
    values = list(
        np.concatenate(
            [rng.normal(30 * cn, 2.0, size=n).clip(min=0.0)
             for cn, n in ((1, 6), (2, 18), (3, 6))]
        )
    )
    got = {}
    for venue in ("0", "1"):
        monkeypatch.setenv("KGT_CN_DEVICE", venue)
        g = CNgroup()
        g.fit(values)
        k = KDEcut()
        k.fit(values)
        got[venue] = (g.base, g.assignCN(values), k.local_min,
                      k.assignCN(values))
    assert got["0"][1] == got["1"][1]
    assert abs(got["0"][0] - got["1"][0]) < 1e-3 * got["1"][0]
    assert got["0"][3] == got["1"][3]
    np.testing.assert_allclose(got["0"][2], got["1"][2], atol=1e-4)
