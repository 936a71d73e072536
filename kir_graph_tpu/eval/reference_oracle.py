"""Run the reference implementation (linnil1/KIR_graph) as an oracle.

The reference's typing / CN / EM stages are pure numpy+pandas
(graphkir/typing_mulit_allele.py, kir_cn.py:41-123, cn_model.py:55-379,
typing_em.py:107-188) and import cleanly in this sandbox once three
plot/IO-only third-party modules are stubbed:

* ``pyhlamsa``  — imported by graphkir/utils.py:19 for a type annotation
* ``plotly``    — used only inside ``plot()`` methods we never call
* ``Bio``       — used only by ``readAlleleLength`` (typing_em.py:32-34)

Nothing from the reference runs in the product path.  This module exists
so tests (tests/test_reference_oracle.py) and the committed cohort QA
(scripts/oracle_cohort.py) can assert that OUR stage D/E outputs —
CN tables, allele calls, EM abundances — are IDENTICAL to the reference
code's on the same ``.variant.json`` / depth-TSV inputs: the strongest
parity evidence obtainable without network access to IPD-KIR.
"""
from __future__ import annotations

import json
import sys
import types

REFERENCE_ROOT = "/root/reference"


class _Anything:
    """Inert placeholder: attribute access / calls return more of itself."""

    def __getattr__(self, name: str) -> "_Anything":
        return _Anything()

    def __call__(self, *args, **kwargs) -> "_Anything":
        return _Anything()


class _StubModule(types.ModuleType):
    def __getattr__(self, name: str):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Anything()


def _installStub(name: str) -> None:
    if name not in sys.modules:
        sys.modules[name] = _StubModule(name)


def importReference(ref_root: str = REFERENCE_ROOT):
    """Import and return the reference ``graphkir`` package (memoized).

    Raises ImportError if the reference tree is absent (e.g. when the
    package is used outside this sandbox) — callers should skip then.
    """
    if "graphkir" in sys.modules:
        return sys.modules["graphkir"]
    for stub in (
        "pyhlamsa",
        "plotly",
        "plotly.express",
        "plotly.graph_objects",
        "plotly.subplots",
        "Bio",
    ):
        _installStub(stub)
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    import graphkir  # noqa: F401
    import graphkir.cn_model  # noqa: F401
    import graphkir.kir_cn  # noqa: F401
    import graphkir.kir_typing  # noqa: F401
    import graphkir.typing_em  # noqa: F401
    import graphkir.typing_mulit_allele  # noqa: F401

    return sys.modules["graphkir"]


def writeReferenceCompatJson(src_json: str, dst_json: str) -> None:
    """Strip fields the reference's loader does not know about.

    Our ``.variant.json`` is schema-compatible with the reference's
    (graphkir/hisat2.py:847-866) except for one addition: each read
    carries a ``pair_index`` back-pointer for novel discovery.  The
    reference constructs ``PairRead(**read)``, which rejects unknown
    keys — so the oracle input drops it (it carries no evidence).
    """
    with open(src_json) as f:
        data = json.load(f)
    for read in data["reads"]:
        read.pop("pair_index", None)
    with open(dst_json, "w") as f:
        json.dump(data, f)


def referenceTyping(
    json_path: str,
    gene_cn: dict[str, int],
    method: str = "full",
    top_n: int = 600,
    variant_correction: bool = True,
):
    """Reference allele typing on a reference-compat ``.variant.json``.

    Returns (called_alleles, warning_genes, model) exactly as the
    reference pipeline would produce them (graphkir/main.py allele step
    -> kir_typing.selectKirTypingModel + Typing.typing).
    """
    gk = importReference()
    kwargs: dict = {}
    if method != "em":
        kwargs = {"top_n": top_n, "variant_correction": variant_correction}
    t = gk.kir_typing.selectKirTypingModel(method, json_path, **kwargs)
    alleles, warnings = t.typing(gene_cn)
    return alleles, warnings, t


def referencePredictCN(
    depth_tsvs: list[str],
    out_tsvs: list[str],
    **kwargs,
) -> None:
    """Reference CN prediction (graphkir/kir_cn.py:146-231)."""
    gk = importReference()
    gk.kir_cn.predictSamplesCN(depth_tsvs, out_tsvs, **kwargs)
