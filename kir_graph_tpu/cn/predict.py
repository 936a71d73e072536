"""
Depth aggregation -> CN assignment driver (reference kir_cn.py).

Depth tables are pandas frames with columns (gene, pos, depth) — the same
shape `samtools depth -aa` produced for the reference, but generated here
by the aligner's scatter-add depth op (ops/depth.py).
"""
from __future__ import annotations

import json
from typing import Any

import pandas as pd

from ..utils import NumpyEncoder, logger
from .models import CNgroup, Dist, KDEcut


def readSamtoolsDepth(depth_filename: str) -> pd.DataFrame:
    """TSV (gene, pos, depth) -> DataFrame (reference samtools_utils.py:17-22)."""
    df = pd.read_csv(
        depth_filename, sep="\t", header=None, names=["gene", "pos", "depth"]
    )
    return df


def selectSamtoolsDepth(
    df: pd.DataFrame, ref_regions: dict[str, list[tuple[int, int]]]
) -> pd.DataFrame:
    """Keep only positions inside the given per-gene regions
    (used for exon-only CN, reference kir_cn.py:15-25)."""
    parts = []
    for gene, regions in ref_regions.items():
        for start, end in regions:
            parts.append(
                df[(df["gene"] == gene) & (start <= df["pos"]) & (df["pos"] <= end)]
            )
    return pd.concat(parts) if parts else df.iloc[0:0]


def filterDepth(
    depth_file: str,
    filtered_depth_file: str,
    bam_selected_regions: dict[str, list[tuple[int, int]]] = {},
) -> None:
    depths = readSamtoolsDepth(depth_file)
    depths = selectSamtoolsDepth(depths, bam_selected_regions)
    depths.to_csv(filtered_depth_file, header=False, index=False, sep="\t")


def aggrDepths(depths: pd.DataFrame, select_mode: str = "p75") -> pd.DataFrame:
    """Positions -> one depth per gene (p75/mean/median,
    reference kir_cn.py:28-38)."""
    if select_mode == "median":
        return depths.groupby(by="gene", as_index=False)["depth"].median()
    if select_mode == "mean":
        return depths.groupby(by="gene", as_index=False)["depth"].mean()
    if select_mode == "p75":
        return depths.groupby(by="gene", as_index=False)["depth"].quantile(0.75)
    raise NotImplementedError(select_mode)


def depthToCN(
    sample_gene_depths: list[dict[str, float]],
    diploid_depth: str = "",
    cluster_method: str = "CNgroup",
    cluster_method_kwargs: dict[str, Any] = {},
    assume_3DL3_diploid: bool = False,
) -> tuple[list[dict[str, int]], Dist]:
    """Pooled gene depths -> per-sample per-gene CN + fitted model.

    Includes the KIR3DL3-diploid refit loop (reference kir_cn.py:87-108):
    host-driven data-dependent control flow around the jitted fit kernel.
    """
    values = [v for gd in sample_gene_depths for v in gd.values()]
    logger.info(
        f"[CN] Predict copy number by {cluster_method} with data size {len(values)}"
    )

    if cluster_method == "CNgroup" or cluster_method.lower() == "lcnd":
        dist: Dist = CNgroup()
        if cluster_method_kwargs:
            dist = CNgroup.setParams(dist.getParams() | cluster_method_kwargs)

        lower_bound = 0.0
        upper_bound = None
        if diploid_depth != "":
            with open(diploid_depth + ".json") as f:
                dp_info = json.load(f)
            mean, dev = float(dp_info["mean"]), float(dp_info["std"])
            lower_bound = (mean - dev) / 2
            upper_bound = (mean + dev) / 2
        else:
            dist.bin_num += 200

        dist.fit(values, lower_bound, upper_bound)
        if assume_3DL3_diploid:
            kir3dl3_depths = [
                float(gd[k])
                for gd in sample_gene_depths
                for k in gd
                if "KIR3DL3" in k
            ]
            if kir3dl3_depths:
                cn = dist.assignCN(kir3dl3_depths)
                original_bin_num = dist.bin_num
                # discrete shrink schedule (reference kir_cn.py:93-106 uses
                # `perc -= 0.2` which leaves a ~7e-17 residue, runs one
                # extra lap and crashes np.histogram with bins=0)
                for decrease_perc in (1.0, 0.8, 0.6, 0.4, 0.2):
                    if all(i == 2 for i in cn):
                        break
                    logger.debug("[CN] Assume 3DL3 cn=2: refit")
                    mean_3dl3 = sum(kir3dl3_depths) / len(kir3dl3_depths)
                    lower = (mean_3dl3 - decrease_perc * 10) / 2
                    upper = (mean_3dl3 + decrease_perc * 10) / 2
                    dist.bin_num = max(1, int(original_bin_num * decrease_perc))
                    dist.fit(values, lower, upper)
                    cn = dist.assignCN(kir3dl3_depths)
                assert all(i == 2 for i in cn), "3DL3 diploid assumption failed"
        logger.info(f"[CN] {cluster_method} base = {dist.base}")  # type: ignore[attr-defined]

    elif cluster_method.lower() == "kde":
        dist = KDEcut()
        dist.fit(values)
        logger.info(f"[CN] KDE cut = {dist.local_min}")  # type: ignore[attr-defined]
    else:
        raise NotImplementedError(cluster_method)

    sample_gene_cns = []
    for gene_depths in sample_gene_depths:
        genes = list(gene_depths.keys())
        cns = dist.assignCN([gene_depths[g] for g in genes])
        sample_gene_cns.append(dict(zip(genes, cns)))
    return sample_gene_cns, dist


def predictSamplesCN(
    samples_depth_tsv: list[str],
    samples_cn: list[str],
    diploid_depth: str = "",
    save_cn_model_path: str | None = None,
    assume_3DL3_diploid: bool = False,
    select_mode: str = "p75",
    per_gene: bool = False,
    cluster_method: str = "CNgroup",
    cluster_method_kwargs: dict[str, Any] = {},
) -> None:
    """Depth TSVs -> per-sample CN TSVs (reference kir_cn.py:146-231)."""
    assert len(samples_depth_tsv) == len(samples_cn)

    sample_gene_depths = []
    for depth_file in samples_depth_tsv:
        logger.info(f"[CN] {select_mode} of depths per gene ({depth_file})")
        df = aggrDepths(readSamtoolsDepth(depth_file), select_mode=select_mode)
        df["depth_file"] = depth_file
        sample_gene_depths.append(df)

    depths_dict = [dict(zip(df["gene"], df["depth"])) for df in sample_gene_depths]
    if not per_gene:
        cns, model = depthToCN(
            depths_dict,
            diploid_depth,
            cluster_method=cluster_method,
            cluster_method_kwargs=cluster_method_kwargs,
            assume_3DL3_diploid=assume_3DL3_diploid,
        )
        model.raw_df = [df.to_dict() for df in sample_gene_depths]
        if save_cn_model_path:
            model.save(save_cn_model_path)
    else:
        # fit one model per gene across samples
        file_index = {name: i for i, name in enumerate(samples_depth_tsv)}
        df_all = pd.concat(sample_gene_depths)
        df_all["gene_sampleid"] = df_all["gene"] + "-" + df_all["depth_file"]
        cns = [dict() for _ in sample_gene_depths]
        models = []
        for gene in sorted(set(df_all["gene"])):
            gd = df_all[df_all["gene"] == gene]
            gene_cns, gene_model = depthToCN(
                [dict(zip(gd["gene_sampleid"], gd["depth"]))],
                cluster_method=cluster_method,
                cluster_method_kwargs=cluster_method_kwargs,
            )
            gene_model.raw_df = [gd.to_dict()]
            models.append((gene, gene_model))
            for gene_and_id, cn in gene_cns[0].items():
                i = file_index[gene_and_id.split("-", 1)[1]]
                cns[i][gene] = cn
        if save_cn_model_path:
            data = []
            for gene, model in models:
                params = model.getParams()
                params["gene"] = gene
                data.append(params)
                with open(save_cn_model_path + f".{gene}.json", "w") as f:
                    json.dump(params, f, cls=NumpyEncoder)
            with open(save_cn_model_path, "w") as f:
                json.dump(data, f, cls=NumpyEncoder)

    for filename, cn, depths in zip(samples_cn, cns, depths_dict):
        df1 = pd.DataFrame(list(cn.items()), columns=["gene", "cn"])
        df2 = pd.DataFrame(list(depths.items()), columns=["gene", "depth"])
        df1.merge(df2, on="gene").to_csv(filename, index=False, sep="\t")


def loadCN(filename_cn: str) -> dict[str, int]:
    data = pd.read_csv(filename_cn, sep="\t", index_col=[0])
    return dict(data.to_dict()["cn"])
