"""Large discrete network fixtures: hailfinder (56), hepar2 (70),
win95pts (76).

Round-3 VERDICT next #5: extend the committed ACCURACY corpus from the
37-node ceiling into the reference suite's "large" discrete regime
(``/root/reference/benchmarking/metadata/bnlearn.json``: hailfinder
56 nodes / 66 arcs, hepar2 70 / 123, win95pts 76 / 112). bnlearn.com is
egress-blocked here, so — as with the insurance/alarm fixtures
(``midsize.py``) — CPT values are seeded Dirichlet draws and ground truth
comes from exact min-weight variable elimination on THESE
parameterizations, making the benchmark self-consistent.

Provenance of the STRUCTURES (stated per-network, be precise when citing):

- ``hailfinder``: the CANONICAL published topology (Abramson, Brown,
  Edwards, Murphy & Winkler 1996, "Hailfinder: A Bayesian system for
  forecasting severe weather") — 56 canonical node names, the published
  66-arc edge list, and the published state counts where documented
  (Scenario 11, Date 6, Dewpoints 7, ...).
- ``hepar2`` and ``win95pts``: SEEDED RECONSTRUCTIONS, not the published
  edge lists. Node names and arity profiles follow the published
  networks (hepar2: Onisko 2003 liver-disorder network, cards 2-4;
  win95pts: the all-binary Microsoft printer troubleshooter); node and
  arc counts match bnlearn's metadata exactly (70/123, 76/112); the arc
  lists are drawn by a seeded generator with hub-skewed in-degrees
  (diseases / fault causes feed many findings) because the exact
  published topologies are not reproducible offline. They exercise the
  same scale regime — treewidth stays within exact-VE range so accuracy
  rows have real ground truth.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .bif import DiscreteBN

# ---------------------------------------------------------------------------
# hailfinder — canonical structure (56 nodes / 66 arcs)
# ---------------------------------------------------------------------------

# node -> (n_states, parents)
_HAILFINDER: Dict[str, Tuple[int, List[str]]] = {
    # vertical-motion block
    "N07muVerMo": (4, []),
    "SubjVertMo": (4, []),
    "QGVertMotion": (4, []),
    "CombVerMo": (4, ["N07muVerMo", "SubjVertMo", "QGVertMotion"]),
    "AreaMeso_ALS": (4, ["CombVerMo"]),
    # moisture block
    "SatContMoist": (4, []),
    "RaoContMoist": (4, []),
    "CombMoisture": (4, ["SatContMoist", "RaoContMoist"]),
    "AreaMoDryAir": (4, ["AreaMeso_ALS", "CombMoisture"]),
    # cloud block
    "VISCloudCov": (3, []),
    "IRCloudCover": (3, []),
    "CombClouds": (3, ["VISCloudCov", "IRCloudCover"]),
    "CldShadeOth": (3, ["AreaMeso_ALS", "AreaMoDryAir", "CombClouds"]),
    # mountain instability / outflow
    "AMInstabMt": (3, []),
    "InsInMt": (3, ["CldShadeOth", "AMInstabMt"]),
    "WndHodograph": (4, []),
    "OutflowFrMt": (3, ["InsInMt", "WndHodograph"]),
    "MorningBound": (3, []),
    "Boundaries": (3, ["WndHodograph", "OutflowFrMt", "MorningBound"]),
    "CldShadeConv": (3, ["InsInMt", "WndHodograph"]),
    "CompPlFcst": (3, ["AreaMeso_ALS", "CldShadeOth", "Boundaries",
                       "CldShadeConv"]),
    "CapChange": (3, ["CompPlFcst"]),
    "LoLevMoistAd": (4, []),
    "InsChange": (3, ["CompPlFcst", "LoLevMoistAd"]),
    "MountainFcst": (3, ["InsInMt"]),
    # scenario block
    "Date": (6, []),
    "Scenario": (11, ["Date"]),
    "ScenRelAMCIN": (2, ["Scenario"]),
    "MorningCIN": (4, []),
    "AMCINInScen": (3, ["ScenRelAMCIN", "MorningCIN"]),
    "CapInScen": (3, ["AMCINInScen", "CapChange"]),
    "ScenRelAMIns": (6, ["Scenario"]),
    "LIfr12ZDENSd": (4, []),
    "AMDewptCalPl": (3, []),
    "AMInsWliScen": (3, ["ScenRelAMIns", "LIfr12ZDENSd", "AMDewptCalPl"]),
    "InsSclInScen": (3, ["AMInsWliScen", "InsChange"]),
    "ScenRel3_4": (5, ["Scenario"]),
    "LatestCIN": (4, []),
    "LLIW": (4, []),
    "CurPropConv": (4, ["LatestCIN", "LLIW"]),
    "ScnRelPlFcst": (11, ["Scenario"]),
    "PlainsFcst": (3, ["CapInScen", "InsSclInScen", "CurPropConv",
                       "ScnRelPlFcst"]),
    "N34StarFcst": (3, ["ScenRel3_4", "PlainsFcst"]),
    "R5Fcst": (3, ["MountainFcst", "N34StarFcst"]),
    # scenario-conditioned observables
    "Dewpoints": (7, ["Scenario"]),
    "LowLLapse": (4, ["Scenario"]),
    "MeanRH": (3, ["Scenario"]),
    "MidLLapse": (4, ["Scenario"]),
    "MvmtFeatures": (4, ["Scenario"]),
    "RHRatio": (3, ["Scenario"]),
    "SfcWndShfDis": (7, ["Scenario"]),
    "SynForcng": (5, ["Scenario"]),
    "TempDis": (4, ["Scenario"]),
    "WindAloft": (4, ["Scenario"]),
    "WindFieldMt": (2, ["Scenario"]),
    "WindFieldPln": (6, ["Scenario"]),
}

# ---------------------------------------------------------------------------
# hepar2 / win95pts — seeded reconstructions at canonical scale
# ---------------------------------------------------------------------------

_HEPAR2_NODES: List[str] = [
    # risk factors / history
    "alcoholism", "hepatotoxic", "injections", "transfusion", "surgery",
    "gallstones", "choledocholithotomy", "hospital", "sex", "age",
    "obesity", "diabetes",
    # disorders (hub nodes)
    "THepatitis", "ChHepatitis", "RHepatitis", "PBC", "fibrosis",
    "Cirrhosis", "Steatosis", "Hyperbilirubinemia", "carcinoma",
    # intermediate states
    "bile_duct_flow", "portal_hypertension", "liver_function",
    "immune_reaction", "cholestasis", "inflammation",
    # findings / symptoms / labs
    "fatigue", "anorexia", "nausea", "bleeding", "flatulence",
    "alcohol_use", "hepatomegaly", "hepatalgia", "density", "ESR",
    "alt", "ast", "ggtp", "cholesterol", "phosphatase", "bilirubin",
    "proteins", "albumin", "platelet", "inr", "urea", "amylase",
    "triglycerides", "le_cells", "ama", "joints", "pain", "skin",
    "itching", "jaundice", "spleen", "spiders", "edema", "palms",
    "consciousness", "irregular_liver", "edge", "upper_pain", "fat",
    "pain_ruq", "pressure_ruq", "encephalopathy", "urine", "ascites",
]

_WIN95PTS_NODES: List[str] = [
    "AppOK", "AppData", "DataFile", "DskLocal", "PrtSpool", "PrtThread",
    "EMFOK", "GDIIN", "GDIOUT", "DrvSet", "DrvOK", "PrtDriver",
    "PrtDataOut", "PrtSel", "PrtPath", "NetOK", "PTROFFLINE", "NtwrkCnfg",
    "PrtQueue", "PrtMem", "PrtTimeOut", "FllCrrptdBffr", "TnrSpply",
    "PrtData", "Problem1", "AppDtGnTm", "PrntPrcssTm", "DeskPrntSpd",
    "PgOrnttnOK", "PrntngArOK", "ScrnFntNtPrntrFnt", "CmpltPgPrntd",
    "GrphcsRltdDrvrSttngs", "EPSGrphc", "NnPSGrphc", "PSGRAPHIC",
    "Problem4", "TrTypFnts", "FntInstlltn", "PrntrAccptsTrtyp", "TTOK",
    "NnTTOK", "ScrnFntsOK", "PrntrDvcOK", "Problem5", "LclOK",
    "DSApplctn", "PrtPort", "NetPrint", "PrtOn", "PrtPaper", "PrtMpTPth",
    "PrtCbl", "PrtPrt", "CblPrtHrdwrOK", "LclPrtOn", "DS_NTOK",
    "DS_LCLOK", "PC2PRT", "PrtStatPaper", "PrtStatToner", "PrtStatMem",
    "PrtStatOff", "PrtIcon", "Problem2", "DrvrSet", "PrtFile",
    "PrtIcnOK", "NtSpd", "DeskNtSpd", "Problem3", "REPEAT", "AvlblVrtlMmry",
    "PSERRMEM", "TstpsTxt", "Problem6",
]


def _seeded_reconstruction(
    name: str,
    nodes: Sequence[str],
    n_edges: int,
    card_pool: Sequence[int],
    hub_frac: float,
    seed: int,
    max_in_degree: int = 4,
    window: int = 25,
) -> Dict[str, Tuple[int, List[str]]]:
    """Seeded DAG with hub-skewed in-degrees over the given node names.

    Nodes keep their listed order as the topological order. A leading
    ``hub_frac`` fraction acts as causes (higher out-degree); edges
    prefer nearby ancestors so treewidth stays VE-tractable. Arc count is
    exact; in-degree capped so CPTs stay dense-representable.
    """
    rng = np.random.default_rng(seed)
    n = len(nodes)
    spec: Dict[str, Tuple[int, List[str]]] = {
        nd: (int(rng.choice(card_pool)), []) for nd in nodes
    }
    n_hub = max(2, int(hub_frac * n))
    in_deg = {nd: 0 for nd in nodes}
    edges = set()
    # First ensure connectivity: every non-root picks one parent.
    for i in range(1, n):
        if rng.random() < 0.12:  # leave some extra roots
            continue
        lo = max(0, i - window)
        # prefer hub ancestors
        cand = list(range(lo, i))
        weights = np.asarray(
            [3.0 if c < n_hub else 1.0 for c in cand], np.float64
        )
        p = int(rng.choice(cand, p=weights / weights.sum()))
        edges.add((p, i))
        in_deg[nodes[i]] += 1
    # Then add arcs until the canonical count, respecting the cap.
    guard = 0
    while len(edges) < n_edges and guard < 100000:
        guard += 1
        i = int(rng.integers(1, n))
        if in_deg[nodes[i]] >= max_in_degree:
            continue
        lo = max(0, i - window)
        cand = [c for c in range(lo, i) if (c, i) not in edges]
        if not cand:
            continue
        weights = np.asarray(
            [3.0 if c < n_hub else 1.0 for c in cand], np.float64
        )
        p = int(rng.choice(cand, p=weights / weights.sum()))
        edges.add((p, i))
        in_deg[nodes[i]] += 1
    assert len(edges) == n_edges, f"{name}: only placed {len(edges)} arcs"
    for p, i in sorted(edges):
        spec[nodes[i]][1].append(nodes[p])
    return spec


def _build(name: str, spec: Dict[str, Tuple[int, List[str]]],
           seed: int) -> DiscreteBN:
    """Seeded-Dirichlet CPTs over a structure (same scheme as midsize.py)."""
    bn = DiscreteBN(name=name)
    for node, (k, parents) in spec.items():
        bn.nodes.append(node)
        bn.states[node] = [f"s{i}" for i in range(k)]
        bn.parents[node] = list(parents)
    for node, (k, parents) in spec.items():
        # stable seed: str hash is PYTHONHASHSEED-randomized per process
        rng = np.random.default_rng(
            zlib.crc32(f"{name}/{node}/{seed}".encode()) % (2**32)
        )
        rows = int(np.prod([spec[p][0] for p in parents])) if parents else 1
        table = rng.dirichlet(np.full(k, 0.6), size=rows).astype(np.float64)
        shape = tuple(spec[p][0] for p in parents) + (k,)
        bn.cpts[node] = table.reshape(shape)
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def hailfinder(seed: int = 0) -> DiscreteBN:
    """56-node / 66-arc CANONICAL hailfinder structure, seeded CPTs."""
    bn = _build("hailfinder", _HAILFINDER, seed)
    assert len(bn.nodes) == 56 and len(bn.edges()) == 66
    return bn


def hepar2(seed: int = 0) -> DiscreteBN:
    """70-node / 123-arc hepar2-scale fixture (seeded reconstruction —
    see module docstring for provenance)."""
    spec = _seeded_reconstruction(
        "hepar2", _HEPAR2_NODES[:70], 123, card_pool=[2, 2, 2, 3, 4],
        hub_frac=0.3, seed=7, window=12,  # window bounds treewidth: the
        # published hepar2 is VE-tractable; keep the reconstruction so too
    )
    bn = _build("hepar2", spec, seed)
    assert len(bn.nodes) == 70 and len(bn.edges()) == 123
    return bn


def win95pts(seed: int = 0) -> DiscreteBN:
    """76-node / 112-arc win95pts-scale fixture, all binary (seeded
    reconstruction — see module docstring for provenance)."""
    spec = _seeded_reconstruction(
        "win95pts", _WIN95PTS_NODES[:76], 112, card_pool=[2],
        hub_frac=0.35, seed=11,
    )
    bn = _build("win95pts", spec, seed)
    assert len(bn.nodes) == 76 and len(bn.edges()) == 112
    return bn
