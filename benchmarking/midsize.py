"""Mid-size canonical network fixtures: insurance (27 nodes) and alarm (37).

Round-2 VERDICT next #9: the committed accuracy artifacts topped out at
32 nodes while the reference's bnlearn corpus runs its accuracy suite on
canonical mid-size structures like insurance (27 nodes / 52 edges, cards
2-5) and alarm (37 nodes / 46 edges, cards 2-4)
(``/root/reference/benchmarking/metadata/bnlearn.json``). bnlearn.com is
egress-blocked here, so these fixtures reproduce the CANONICAL published
STRUCTURES — node names, arities, and edge lists from the original papers
(Beinlich et al. 1989 "The ALARM monitoring system"; Binder et al. 1997
"Adaptive probabilistic networks with hidden variables") — while CPT
values are seeded Dirichlet draws (the published parameter values ship
only inside the bnlearn BIF/RDS files). Ground truth is computed from
THESE parameterizations by exact variable elimination, so the benchmark
is self-consistent; both structures have small treewidth (<= ~8), well
inside VE range.
"""

from __future__ import annotations

import numpy as np

from .bif import DiscreteBN

# node -> (n_states, parents)  — canonical ALARM structure (37 / 46)
_ALARM = {
    "MINVOLSET": (3, []),
    "VENTMACH": (4, ["MINVOLSET"]),
    "DISCONNECT": (2, []),
    "VENTTUBE": (4, ["DISCONNECT", "VENTMACH"]),
    "KINKEDTUBE": (2, []),
    "INTUBATION": (3, []),
    "VENTLUNG": (4, ["INTUBATION", "KINKEDTUBE", "VENTTUBE"]),
    "VENTALV": (4, ["INTUBATION", "VENTLUNG"]),
    "ARTCO2": (3, ["VENTALV"]),
    "EXPCO2": (4, ["ARTCO2", "VENTLUNG"]),
    "MINVOL": (4, ["INTUBATION", "VENTLUNG"]),
    "FIO2": (2, []),
    "PVSAT": (3, ["FIO2", "VENTALV"]),
    "PULMEMBOLUS": (2, []),
    "PAP": (3, ["PULMEMBOLUS"]),
    "SHUNT": (2, ["INTUBATION", "PULMEMBOLUS"]),
    "SAO2": (3, ["PVSAT", "SHUNT"]),
    "PRESS": (4, ["INTUBATION", "KINKEDTUBE", "VENTTUBE"]),
    "INSUFFANESTH": (2, []),
    "ANAPHYLAXIS": (2, []),
    "TPR": (3, ["ANAPHYLAXIS"]),
    "CATECHOL": (2, ["ARTCO2", "INSUFFANESTH", "SAO2", "TPR"]),
    "HR": (3, ["CATECHOL"]),
    "ERRCAUTER": (2, []),
    "HREKG": (3, ["ERRCAUTER", "HR"]),
    "HRSAT": (3, ["ERRCAUTER", "HR"]),
    "ERRLOWOUTPUT": (2, []),
    "HRBP": (3, ["ERRLOWOUTPUT", "HR"]),
    "HYPOVOLEMIA": (2, []),
    "LVFAILURE": (2, []),
    "HISTORY": (2, ["LVFAILURE"]),
    "LVEDVOLUME": (3, ["HYPOVOLEMIA", "LVFAILURE"]),
    "CVP": (3, ["LVEDVOLUME"]),
    "PCWP": (3, ["LVEDVOLUME"]),
    "STROKEVOLUME": (3, ["HYPOVOLEMIA", "LVFAILURE"]),
    "CO": (3, ["HR", "STROKEVOLUME"]),
    "BP": (3, ["CO", "TPR"]),
}

# node -> (n_states, parents)  — canonical INSURANCE structure (27 / 52)
_INSURANCE = {
    "Age": (3, []),
    "SocioEcon": (4, ["Age"]),
    "GoodStudent": (2, ["Age", "SocioEcon"]),
    "RiskAversion": (4, ["Age", "SocioEcon"]),
    "VehicleYear": (2, ["SocioEcon", "RiskAversion"]),
    "MakeModel": (5, ["SocioEcon", "RiskAversion"]),
    "SeniorTrain": (2, ["Age", "RiskAversion"]),
    "DrivingSkill": (3, ["Age", "SeniorTrain"]),
    "DrivQuality": (3, ["DrivingSkill", "RiskAversion"]),
    "DrivHist": (3, ["DrivingSkill", "RiskAversion"]),
    "Antilock": (2, ["VehicleYear", "MakeModel"]),
    "Mileage": (4, []),
    "Accident": (4, ["Antilock", "Mileage", "DrivQuality"]),
    "Airbag": (2, ["VehicleYear", "MakeModel"]),
    "RuggedAuto": (3, ["VehicleYear", "MakeModel"]),
    "ThisCarDam": (4, ["Accident", "RuggedAuto"]),
    "CarValue": (5, ["VehicleYear", "MakeModel", "Mileage"]),
    "HomeBase": (4, ["RiskAversion", "SocioEcon"]),
    "AntiTheft": (2, ["RiskAversion", "SocioEcon"]),
    "Theft": (2, ["AntiTheft", "HomeBase", "CarValue"]),
    "ThisCarCost": (4, ["ThisCarDam", "CarValue", "Theft"]),
    "OtherCarCost": (4, ["Accident", "RuggedAuto"]),
    "PropCost": (4, ["ThisCarCost", "OtherCarCost"]),
    "OtherCar": (2, ["SocioEcon"]),
    "Cushioning": (4, ["RuggedAuto", "Airbag"]),
    "MedCost": (4, ["Accident", "Age", "Cushioning"]),
    "ILiCost": (4, ["Accident"]),
}


def _build(name: str, spec: dict, seed: int) -> DiscreteBN:
    """Seeded-Dirichlet CPTs over a canonical structure.

    Concentration 0.6 gives peaked-but-not-degenerate rows (realistic for
    diagnostic networks); each node draws from its own fold of the seed so
    a structure edit never silently reshuffles every other node's CPT.
    """
    bn = DiscreteBN(name=name)
    for node, (k, parents) in spec.items():
        bn.nodes.append(node)
        bn.states[node] = [f"s{i}" for i in range(k)]
        bn.parents[node] = list(parents)
    for node, (k, parents) in spec.items():
        # zlib.crc32: Python's str hash is randomized per process
        # (PYTHONHASHSEED), which would silently re-parameterize the
        # "deterministic" fixtures on every run (round-4 review finding).
        import zlib

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


def insurance(seed: int = 0) -> DiscreteBN:
    """27-node / 52-edge canonical insurance structure, seeded CPTs."""
    bn = _build("insurance", _INSURANCE, seed)
    assert len(bn.nodes) == 27 and len(bn.edges()) == 52
    return bn


def alarm(seed: int = 0) -> DiscreteBN:
    """37-node / 46-edge canonical alarm structure, seeded CPTs."""
    bn = _build("alarm", _ALARM, seed)
    assert len(bn.nodes) == 37 and len(bn.edges()) == 46
    return bn
