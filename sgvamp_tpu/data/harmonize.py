"""SNP harmonization across cohorts from PLINK .bim files.

Reimplements the reference's .bim handling (reference src/main.py:126-165)
in one process: read K .bim files, outer-merge variant lists into a
reference panel sorted by coordinate, and build per-cohort index maps
(local index -> reference index). Where the reference assigns each
locally-missing SNP a "source" MPI rank to fetch LD rows from at load time
(src/main.py:156-164, 211-249), the single-driver design resolves missing
data by construction during the merge (see loaders.fill_missing_from_source).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

BIM_COLUMNS = ["Chromosome", "Variant", "Position", "Coordinate", "Allele1", "Allele2"]


@dataclasses.dataclass
class HarmonizedPanel:
    """Result of cross-cohort SNP harmonization.

    variants:  reference variant list (length M), coordinate-sorted.
    M:         reference panel size.
    bim_ref:   merged .bim dataframe (first 6 columns, reference order).
    i_maps:    per-cohort local->reference index arrays.
    sources:   per-cohort (M,) int arrays: for each reference SNP, the
               cohort that supplies its data for this cohort - itself when
               present locally, else the holder cohort with the largest N
               (reference src/main.py:156-164).
    missing:   per-cohort sets of reference indices absent locally.
    """

    variants: List[str]
    M: int
    bim_ref: pd.DataFrame
    i_maps: List[np.ndarray]
    sources: List[np.ndarray]
    missing: List[np.ndarray]


def read_bim(path: str) -> pd.DataFrame:
    return pd.read_table(path, sep=r"\s+", header=None, names=BIM_COLUMNS)


def harmonize(
    bim_paths: Sequence[str],
    N_list: Sequence[float],
    out_bim_path: Optional[str] = None,
) -> HarmonizedPanel:
    """Merge K cohort .bim files into a reference panel.

    Mirrors the reference merge: outer-join on Variant only, then a stable
    sort by Coordinate (reference src/main.py:139-142); the merged .bim is
    optionally written (reference writes it on rank 0, :148-150).
    """
    K = len(bim_paths)
    bims = [read_bim(p) for p in bim_paths]
    ref = bims[0]
    for k in range(1, K):
        ref = pd.merge(ref, bims[k], on=["Variant"], how="outer", suffixes=("", "_y"))
        # Fill metadata for variants absent from earlier cohorts from this
        # cohort's columns, then drop the suffixed duplicates. (The
        # reference keeps NaN metadata and would crash at K>=3 when the
        # '_y' suffix collides on the next merge.)
        for col in [c for c in BIM_COLUMNS if c != "Variant"]:
            if col + "_y" in ref.columns:
                ref[col] = ref[col].fillna(ref[col + "_y"])
        ref = ref[BIM_COLUMNS]
    ref = ref.sort_values(by=["Coordinate"])
    variants = list(ref["Variant"])
    M = len(variants)
    if out_bim_path is not None:
        ref.iloc[:, :6].to_csv(out_bim_path, header=None, sep="\t", index=False)

    idx: Dict[str, int] = {rs: i for i, rs in enumerate(variants)}
    N_arr = np.asarray(N_list, dtype=np.float64)

    # Vectorized holder assignment (the reference loops Python-side per
    # missing variant, src/main.py:156-164; at M~1M that is minutes). One
    # (K, M) presence table + a masked argmax reproduces its choice - the
    # largest-N holder, first cohort on ties - in O(K*M).
    i_maps = [bims[k]["Variant"].map(idx).to_numpy(dtype=np.int64)
              for k in range(K)]
    present = np.zeros((K, M), dtype=bool)
    for k in range(K):
        present[k, i_maps[k]] = True

    sources, missing = [], []
    for k in range(K):
        source = np.full(M, k, dtype=np.int64)
        miss = np.flatnonzero(~present[k])
        if miss.size:
            scores = np.where(present[:, miss], N_arr[:, None], -np.inf)
            source[miss] = np.argmax(scores, axis=0)
        sources.append(source)
        missing.append(miss.astype(np.int64))
    return HarmonizedPanel(
        variants=variants, M=M, bim_ref=ref, i_maps=i_maps,
        sources=sources, missing=missing,
    )


def identity_panel(M: int, K: int) -> HarmonizedPanel:
    """Trivial panel when no .bim files are given: all cohorts share the
    same M markers in the same order. (The reference crashes in this case -
    quirks ledger #2; we support it as the natural default for .npy/.npz
    pipelines.)"""
    i_map = np.arange(M, dtype=np.int64)
    return HarmonizedPanel(
        variants=[f"snp{i}" for i in range(M)],
        M=M,
        bim_ref=pd.DataFrame(),
        i_maps=[i_map.copy() for _ in range(K)],
        sources=[np.full(M, k, dtype=np.int64) for k in range(K)],
        missing=[np.empty(0, dtype=np.int64) for _ in range(K)],
    )
