"""Pure-Python reader/writer for R's RDS serialization + bn.fit ingestion.

Capability parity with the reference's bn.fit parser
(``/root/reference/benchmarking/bnlearn_bnfit.py:11-1549``), which relies
on external R-interop packages (rds2py / pyreadr / rdata) to deserialize
``.rds`` files before converting the ``bn.fit`` object. None of those
packages (nor R itself) exist in this image, so this module implements
the R serialization format directly — the XDR (big-endian binary)
variant that ``saveRDS`` emits, versions 2 and 3, gzip/raw streams —
for the SEXP subset R uses to store ``bn.fit`` objects:

    NILSXP/NILVALUE, SYMSXP, LISTSXP (pairlists/attributes), CHARSXP,
    LGLSXP, INTSXP, REALSXP, STRSXP, VECSXP, REFSXP (reference table),
    and the ALTREP compact integer sequence R >= 3.5 writes for ``1:n``
    (which appears in ``dim``/index vectors of real-world files).

Format reference: R Internals §"Serialization Formats" (the flags word
packs the SEXP type in the low byte; 0x100 = object bit, 0x200 = has
attributes, 0x400 = has tag; reference ids live in the high bits of a
REFSXP flags word).

``bn.fit`` layout (both bnlearn and the reference's parser agree):
a named generic vector of nodes; each node is a named list with
``node``/``parents``/``children`` character vectors plus, for discrete
nodes, ``prob`` — a REALSXP with ``dim`` and ``dimnames`` whose FIRST
axis is the node itself (parents follow) — and, for Gaussian nodes,
``coefficients`` (named: "(Intercept)" + parents) and ``sd``.
``read_bnfit`` converts discrete fits to :class:`~benchmarking.bif.DiscreteBN`
(transposing CPTs to this suite's [parents..., node] layout) and
Gaussian fits to :class:`~benchmarking.gaussian_bn.GaussianBN`.

A writer (``write_rds``) emits the same format so fixtures and tests
round-trip without R; it also lets users EXPORT fitted networks to R.
"""

from __future__ import annotations

import gzip
import io
import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# SEXP type codes (R internals)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
STRSXP = 16
VECSXP = 19
ALTREP_SXP = 238
NILVALUE_SXP = 254
REFSXP = 255
GLOBALENV_SXP = 253
NAMESPACESXP = 249

_HAS_OBJ = 0x100
_HAS_ATTR = 0x200
_HAS_TAG = 0x400

R_NA_INT = -2147483648


@dataclass
class RObj:
    """A deserialized R object: data + attributes (+class flag)."""

    type: int
    value: Any = None
    attributes: Dict[str, "RObj"] = field(default_factory=dict)
    is_object: bool = False

    def attr(self, name: str, default=None):
        a = self.attributes.get(name)
        return a.value if a is not None else default

    @property
    def names(self) -> Optional[List[str]]:
        return self.attr("names")

    @property
    def rclass(self) -> Tuple[str, ...]:
        c = self.attr("class") or []
        return tuple(c)

    def __getitem__(self, key):
        if isinstance(key, str):
            names = self.names or []
            try:
                return self.value[names.index(key)]
            except ValueError:
                raise KeyError(key) from None
        return self.value[key]


class RDSReadError(ValueError):
    pass


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.b = data
        self.at = 0
        self.refs: List[RObj] = []

    def _take(self, n: int) -> bytes:
        if self.at + n > len(self.b):
            raise RDSReadError("truncated RDS stream")
        out = self.b[self.at : self.at + n]
        self.at += n
        return out

    def u8(self) -> int:
        return self._take(1)[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def f64(self) -> float:
        return struct.unpack(">d", self._take(8))[0]

    # -- top level ---------------------------------------------------------

    def read(self) -> RObj:
        fmt = self._take(2)
        if fmt not in (b"X\n",):
            raise RDSReadError(
                f"unsupported RDS format marker {fmt!r} (only the XDR "
                "binary variant saveRDS writes by default is supported)"
            )
        version = self.i32()
        self.i32()  # writer R version
        self.i32()  # minimal reader R version
        if version not in (2, 3):
            raise RDSReadError(f"unsupported RDS version {version}")
        if version == 3:
            enc_len = self.i32()
            self._take(enc_len)  # native encoding name (e.g. "UTF-8")
        return self.item()

    # -- items -------------------------------------------------------------

    def item(self) -> RObj:
        flags = self.i32()
        t = flags & 0xFF
        if t == NILVALUE_SXP or t == NILSXP:
            return RObj(NILSXP, None)
        if t == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i32()
            try:
                return self.refs[idx - 1]  # 1-based
            except IndexError:
                raise RDSReadError(f"dangling REFSXP {idx}") from None
        if t == SYMSXP:
            name = self.item()  # CHARSXP
            obj = RObj(SYMSXP, name.value)
            self.refs.append(obj)
            return obj
        if t == GLOBALENV_SXP:
            return RObj(GLOBALENV_SXP, "<globalenv>")
        if t == CHARSXP:
            n = self.i32()
            if n == -1:
                return RObj(CHARSXP, None)  # NA_character_
            return RObj(CHARSXP, self._take(n).decode("utf-8", "replace"))
        if t == LISTSXP:
            return self._pairlist(flags)
        if t == ALTREP_SXP:
            return self._altrep()
        has_attr = bool(flags & _HAS_ATTR)
        if t == LGLSXP:
            n = self.i32()
            vals = [self.i32() for _ in range(n)]
            value = [None if v == R_NA_INT else bool(v) for v in vals]
            obj = RObj(LGLSXP, value, is_object=bool(flags & _HAS_OBJ))
        elif t == INTSXP:
            n = self.i32()
            raw = struct.unpack(f">{n}i", self._take(4 * n)) if n else ()
            obj = RObj(
                INTSXP,
                np.asarray(raw, np.int64),
                is_object=bool(flags & _HAS_OBJ),
            )
        elif t == REALSXP:
            n = self.i32()
            raw = struct.unpack(f">{n}d", self._take(8 * n)) if n else ()
            obj = RObj(
                REALSXP,
                np.asarray(raw, np.float64),
                is_object=bool(flags & _HAS_OBJ),
            )
        elif t == STRSXP:
            n = self.i32()
            obj = RObj(
                STRSXP,
                [self.item().value for _ in range(n)],
                is_object=bool(flags & _HAS_OBJ),
            )
        elif t == VECSXP:
            n = self.i32()
            obj = RObj(
                VECSXP,
                [self.item() for _ in range(n)],
                is_object=bool(flags & _HAS_OBJ),
            )
        else:
            raise RDSReadError(f"unsupported SEXP type {t} in bn.fit RDS")
        if has_attr:
            obj.attributes = self._attr_dict()
        return obj

    def _pairlist(self, flags: int) -> RObj:
        """LISTSXP chain -> RObj(LISTSXP, [(tag, value), ...])."""
        pairs = []
        while True:
            if flags & _HAS_ATTR:
                self._attr_dict()  # pairlist attributes: rare; discard
            tag = self.item() if flags & _HAS_TAG else None
            car = self.item()
            pairs.append((tag.value if tag else None, car))
            nxt = self.i32()
            t = nxt & 0xFF
            if t in (NILVALUE_SXP, NILSXP):
                break
            if t != LISTSXP:
                # cdr is a non-pairlist object (degenerate but legal)
                self.at -= 4
                pairs.append((None, self.item()))
                break
            flags = nxt
        return RObj(LISTSXP, pairs)

    def _attr_dict(self) -> Dict[str, RObj]:
        pl = self.item()
        out: Dict[str, RObj] = {}
        if pl.type == LISTSXP:
            for tag, val in pl.value:
                if tag is not None:
                    out[tag] = val
        return out

    def _altrep(self) -> RObj:
        info = self.item()  # pairlist: (class symbol . (package . type))
        state = self.item()
        self.item()  # attributes slot (fos); compact seqs carry none
        cls = None
        if info.type == LISTSXP and info.value:
            first = info.value[0][1]
            if first.type == SYMSXP:
                cls = first.value
        if cls == "compact_intseq":
            # state: REALSXP [n, start, step]
            n, start, step = [int(v) for v in np.asarray(state.value)]
            return RObj(
                INTSXP, np.arange(start, start + n * step, step, np.int64)
            )
        if cls == "compact_realseq":
            n, start, step = np.asarray(state.value)
            return RObj(
                REALSXP,
                start + np.arange(int(n), dtype=np.float64) * step,
            )
        if cls in ("wrap_integer", "wrap_real", "wrap_logical",
                   "wrap_string"):
            # state: (wrapped . metadata)
            if state.type == LISTSXP and state.value:
                return state.value[0][1]
        raise RDSReadError(f"unsupported ALTREP class {cls!r}")


def read_rds(source) -> RObj:
    """Read an .rds file (path / bytes / file-like) into an RObj tree."""
    if isinstance(source, bytes):
        data = source
    elif isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    else:
        data = source.read()
    if data[:2] == b"\x1f\x8b":  # gzip (saveRDS default)
        data = gzip.decompress(data)
    elif data[:3] == b"BZh":
        import bz2

        data = bz2.decompress(data)
    elif data[:6] == b"\xfd7zXZ\x00":
        import lzma

        data = lzma.decompress(data)
    return _Reader(data).read()


# ---------------------------------------------------------------------------
# bn.fit conversion
# ---------------------------------------------------------------------------

def read_bnfit(source, name: str = "bnfit"):
    """.rds bn.fit -> DiscreteBN (discrete fits) or GaussianBN (Gaussian).

    Mirrors the reference parser's model classes
    (``bnlearn_bnfit.py``: BNFitModel with DiscreteCPD CPT dicts and
    ContinuousCPD conditional linear Gaussians), materialized directly
    into this suite's network types.
    """
    obj = read_rds(source)
    if obj.type != VECSXP or not obj.names:
        raise RDSReadError("not a bn.fit object (expected a named list)")
    node_names = list(obj.names)
    kinds = set()
    for node_obj in obj.value:
        kinds.add(
            "g" if "coefficients" in (node_obj.names or []) else "d"
        )
    if kinds == {"d"}:
        return _discrete_bnfit(obj, node_names, name)
    if kinds == {"g"}:
        # an all-Gaussian net may still be conditional-Gaussian if any
        # node carries a per-config coefficient MATRIX (bn.fit.cgnode)
        if any(
            n["coefficients"].attr("dim") is not None
            for n in obj.value
            if "coefficients" in (n.names or [])
        ):
            return _clg_bnfit(obj, node_names, name)
        return _gaussian_bnfit(obj, node_names, name)
    return _clg_bnfit(obj, node_names, name)


def _discrete_bnfit(obj: RObj, node_names: List[str], name: str):
    from .bif import DiscreteBN

    bn = DiscreteBN(name=name)
    for node, node_obj in zip(node_names, obj.value):
        parents = [str(p) for p in (node_obj["parents"].value or [])]
        prob = node_obj["prob"]
        dims = [int(d) for d in np.asarray(prob.attr("dim", []))]
        dimnames = prob.attr("dimnames")
        if not dims or dimnames is None:
            raise RDSReadError(f"node {node!r}: prob lacks dim/dimnames")
        states = [str(s) for s in dimnames[0].value]
        # R arrays are column-major with the NODE axis first; transpose
        # to this suite's [parent1, ..., parentK, node] layout.
        table = np.asarray(prob.value, np.float64).reshape(
            dims, order="F"
        )
        table = np.moveaxis(table, 0, -1)
        bn.nodes.append(str(node))
        bn.states[str(node)] = states
        bn.parents[str(node)] = parents
        bn.cpts[str(node)] = table
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def _gaussian_bnfit(obj: RObj, node_names: List[str], name: str):
    from .gaussian_bn import GaussianBN

    nodes, parents, weights, bias, sigma = [], {}, {}, {}, {}
    for node, node_obj in zip(node_names, obj.value):
        node = str(node)
        pars = [str(p) for p in (node_obj["parents"].value or [])]
        coefs = node_obj["coefficients"]
        cnames = list(coefs.names or [])
        cvals = np.asarray(coefs.value, np.float64)
        cmap = dict(zip(cnames, cvals))
        nodes.append(node)
        parents[node] = pars
        bias[node] = float(cmap.get("(Intercept)", 0.0))
        weights[node] = [float(cmap.get(p, 0.0)) for p in pars]
        sd = np.asarray(node_obj["sd"].value, np.float64)
        sigma[node] = float(sd.ravel()[0]) if sd.size else 0.0
    return GaussianBN(
        name=name,
        nodes=nodes,
        parents=parents,
        weights=weights,
        bias=bias,
        sigma=sigma,
    )


def _clg_bnfit(obj: RObj, node_names: List[str], name: str):
    """Mixed discrete/Gaussian bn.fit (R class ``bn.fit.cgnet``) ->
    CLGaussianBN. Continuous nodes are ``bn.fit.cgnode`` (coefficients
    MATRIX with one column per discrete-parent configuration in R
    ``expand.grid`` order — FIRST discrete parent varies fastest — plus
    ``dparents``/``gparents`` 1-based index vectors and ``dlevels``) or
    plain ``bn.fit.gnode`` (named coefficient vector, one regime).
    Semantics mirror the reference parser
    (``/root/reference/benchmarking/bnlearn_bnfit.py:1024-1110``).
    """
    from .clg_bn import CLGaussianBN

    clg = CLGaussianBN(name=name)
    by_name = dict(zip(node_names, obj.value))

    # pass 1: discrete nodes establish states/cards
    states: Dict[str, List[str]] = {}
    for node, node_obj in by_name.items():
        if "prob" not in (node_obj.names or []):
            continue
        prob = node_obj["prob"]
        dims = [int(d) for d in np.asarray(prob.attr("dim", []))]
        dimnames = prob.attr("dimnames")
        if not dims or dimnames is None:
            raise RDSReadError(f"node {node!r}: prob lacks dim/dimnames")
        states[str(node)] = [str(s) for s in dimnames[0].value]

    # pass 2: all nodes
    for node, node_obj in by_name.items():
        node = str(node)
        parents = [str(p) for p in (node_obj["parents"].value or [])]
        clg.parents[node] = parents
        if node in states:
            clg.types[node] = "discrete"
            clg.cards[node] = len(states[node])
            prob = node_obj["prob"]
            dims = [int(d) for d in np.asarray(prob.attr("dim", []))]
            table = np.asarray(prob.value, np.float64).reshape(
                dims, order="F"
            )
            clg.cpts[node] = np.moveaxis(table, 0, -1).tolist()
            bad = [p for p in parents if p not in states]
            if bad:
                raise RDSReadError(
                    f"discrete node {node!r} has continuous parents "
                    f"{bad} (violates the CLG restriction)"
                )
            continue
        clg.types[node] = "continuous"
        names = node_obj.names or []
        coefs = node_obj["coefficients"] if "coefficients" in names else (
            node_obj["coef"]
        )
        sd = np.asarray(node_obj["sd"].value, np.float64).ravel()
        dim = coefs.attr("dim")
        if dim is None:
            # gnode: single regime, all parents continuous
            cnames = list(coefs.names or [])
            cmap = dict(zip(cnames, np.asarray(coefs.value, np.float64)))
            clg.bias[node] = [float(cmap.get("(Intercept)", 0.0))]
            clg.weights[node] = [[float(cmap.get(p, 0.0)) for p in parents]]
            clg.sigma[node] = [float(sd[0]) if sd.size else 1.0]
            continue
        # cgnode
        nrow, ncol = (int(d) for d in np.asarray(dim))
        mat = np.asarray(coefs.value, np.float64).reshape(
            (nrow, ncol), order="F"
        )
        dp_idx = [
            int(i) - 1
            for i in np.asarray(node_obj["dparents"].value, np.int64)
        ]
        gp_idx = [
            int(i) - 1
            for i in np.asarray(node_obj["gparents"].value, np.int64)
        ]
        disc_par = [parents[i] for i in dp_idx]
        cont_par = [parents[i] for i in gp_idx]
        dlevels = node_obj["dlevels"] if "dlevels" in names else None
        dlevels_list = (
            [[str(s) for s in lv.value] for lv in dlevels.value]
            if dlevels is not None
            else [states[p] for p in disc_par]
        )
        dimnames = coefs.attr("dimnames")
        if dimnames is not None and dimnames[0].value:
            row_names = [str(r) for r in dimnames[0].value]
        else:
            row_names = ["(Intercept)"] + cont_par
        row_of = {r: i for i, r in enumerate(row_names)}
        int_row = row_of.get("(Intercept)", 0)
        # regime order: CLGaussianBN.regime_index iterates disc parents
        # in PARENTS order, first parent MOST significant
        order = [p for p in parents if p in disc_par]
        n_reg = int(np.prod([len(states[p]) for p in order])) if order else 1
        bias = [0.0] * n_reg
        weights = [[0.0] * len(cont_par) for _ in range(n_reg)]
        sigma = [1.0] * n_reg
        cards_el = [len(lv) for lv in dlevels_list]
        for col in range(ncol):
            # expand.grid: first dlevels entry varies fastest
            rem, assign = col, {}
            for p, lv in zip(disc_par, dlevels_list):
                assign[p] = states[p].index(lv[rem % len(lv)])
                rem //= len(lv)
            r = 0
            for p in order:
                r = r * len(states[p]) + assign[p]
            bias[r] = float(mat[int_row, col])
            weights[r] = [
                float(mat[row_of.get(p_, int_row), col])
                if p_ in row_of
                else 0.0
                for p_ in cont_par
            ]
            sigma[r] = float(sd[col] if col < sd.size else sd[-1])
        clg.bias[node] = bias
        clg.weights[node] = weights
        clg.sigma[node] = sigma

    # topological order
    seen: Dict[str, int] = {}
    out: List[str] = []

    def visit(v):
        if seen.get(v) == 2:
            return
        if seen.get(v) == 1:
            raise RDSReadError("cycle in bn.fit parent structure")
        seen[v] = 1
        for p in clg.parents[v]:
            visit(p)
        seen[v] = 2
        out.append(v)

    for v in by_name:
        visit(str(v))
    clg.nodes = out
    return clg


# ---------------------------------------------------------------------------
# Writer (fixtures / export)
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self) -> None:
        self.out = io.BytesIO()
        self.sym_refs: Dict[str, int] = {}

    def i32(self, v: int) -> None:
        self.out.write(struct.pack(">i", v))

    def f64(self, v: float) -> None:
        self.out.write(struct.pack(">d", v))

    def header(self) -> None:
        self.out.write(b"X\n")
        self.i32(2)  # version 2: widest reader compatibility
        self.i32(0x030403)  # writer "R 3.4.3"
        self.i32(0x020300)  # min reader "R 2.3.0"

    def flags(self, t: int, has_attr=False, has_tag=False, obj=False):
        f = t
        if obj:
            f |= _HAS_OBJ
        if has_attr:
            f |= _HAS_ATTR
        if has_tag:
            f |= _HAS_TAG
        self.i32(f)

    def charsxp(self, s: str) -> None:
        b = s.encode("utf-8")
        self.i32(CHARSXP | (64 << 12))  # UTF-8 encoding level bit
        self.i32(len(b))
        self.out.write(b)

    def symbol(self, name: str) -> None:
        if name in self.sym_refs:
            self.i32(REFSXP | (self.sym_refs[name] << 8))
            return
        self.i32(SYMSXP)
        self.charsxp(name)
        self.sym_refs[name] = len(self.sym_refs) + 1

    def _attrs(self, attributes: Dict[str, Any]) -> None:
        items = list(attributes.items())
        for i, (k, v) in enumerate(items):
            self.flags(LISTSXP, has_tag=True)
            self.symbol(k)
            self.item(v)
        self.i32(NILVALUE_SXP)

    def item(self, v: Any, attributes: Optional[Dict[str, Any]] = None):
        attributes = dict(attributes or {})
        if isinstance(v, RObj):
            attributes = {
                k: a.value if isinstance(a, RObj) else a
                for k, a in v.attributes.items()
            } | attributes
            v = v.value
        if isinstance(v, np.ndarray) and v.ndim > 1:
            attributes.setdefault("dim", np.asarray(v.shape, np.int64))
            v = v.ravel(order="F")
        has_attr = bool(attributes)
        if v is None:
            self.i32(NILVALUE_SXP)
            return
        if isinstance(v, dict):  # named list
            attributes.setdefault("names", list(v))
            self.flags(VECSXP, has_attr=True)
            self.i32(len(v))
            for item in v.values():
                self.item(item)
            self._attrs(attributes)
            return
        if isinstance(v, (list, tuple)):
            if all(isinstance(x, str) for x in v):
                self.flags(STRSXP, has_attr=has_attr)
                self.i32(len(v))
                for s in v:
                    self.charsxp(s)
            else:
                self.flags(VECSXP, has_attr=has_attr)
                self.i32(len(v))
                for item in v:
                    self.item(item)
            if has_attr:
                self._attrs(attributes)
            return
        if isinstance(v, str):
            self.item([v], attributes)
            return
        arr = np.asarray(v)
        if arr.ndim == 0:
            arr = arr.reshape(1)
        if arr.dtype.kind in "iu":
            self.flags(INTSXP, has_attr=has_attr)
            self.i32(arr.size)
            for x in arr:
                self.i32(int(x))
        elif arr.dtype.kind == "b":
            self.flags(LGLSXP, has_attr=has_attr)
            self.i32(arr.size)
            for x in arr:
                self.i32(int(x))
        else:
            self.flags(REALSXP, has_attr=has_attr)
            self.i32(arr.size)
            for x in arr:
                self.f64(float(x))
        if has_attr:
            self._attrs(attributes)


def write_rds(value: Any, path: Optional[str] = None,
              compress: bool = True) -> bytes:
    """Serialize a python structure (dicts = named lists, numpy arrays =
    typed vectors, RObj trees) to RDS bytes; optionally write to disk."""
    w = _Writer()
    w.header()
    w.item(value)
    data = w.out.getvalue()
    if compress:
        data = gzip.compress(data)
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def bnfit_bytes(bn) -> bytes:
    """Export a DiscreteBN as an R ``bn.fit.dnet``-shaped RDS payload
    (inverse of ``read_bnfit``; lets R / bnlearn consume fitted nets)."""
    children: Dict[str, List[str]] = {n: [] for n in bn.nodes}
    for c in bn.nodes:
        for p in bn.parents[c]:
            children[p].append(c)
    fit: Dict[str, Any] = {}
    for node in bn.nodes:
        parents = bn.parents[node]
        table = np.moveaxis(np.asarray(bn.cpts[node], np.float64), -1, 0)
        dimnames = [list(bn.states[node])] + [
            list(bn.states[p]) for p in parents
        ]
        fit[node] = {
            "node": node,
            "parents": list(parents),
            "children": children[node],
            "prob": RObj(
                REALSXP,
                table,
                attributes={
                    "dim": RObj(
                        INTSXP, np.asarray(table.shape, np.int64)
                    ),
                    "dimnames": RObj(
                        VECSXP, dimnames
                    ),
                },
            ),
        }
    w = _Writer()
    w.header()
    w.item(fit, attributes={"class": ["bn.fit", "bn.fit.dnet"]})
    return gzip.compress(w.out.getvalue())


def clg_bnfit_bytes(clg) -> bytes:
    """Export a CLGaussianBN as an R ``bn.fit.cgnet``-shaped RDS payload
    (inverse of the ``_clg_bnfit`` reader; discrete nodes as dnode CPTs,
    continuous nodes as cgnode per-config coefficient matrices in R
    ``expand.grid`` column order)."""
    children: Dict[str, List[str]] = {n: [] for n in clg.nodes}
    for c in clg.nodes:
        for p in clg.parents[c]:
            children[p].append(c)
    states = {
        n: [f"s{k}" for k in range(clg.cards[n])]
        for n in clg.nodes
        if clg.types[n] == "discrete"
    }
    fit: Dict[str, Any] = {}
    for node in clg.nodes:
        parents = clg.parents[node]
        if clg.types[node] == "discrete":
            table = np.moveaxis(
                np.asarray(clg.cpts[node], np.float64), -1, 0
            )
            fit[node] = {
                "node": node,
                "parents": list(parents),
                "children": children[node],
                "prob": RObj(
                    REALSXP,
                    table,
                    attributes={
                        "dim": RObj(
                            INTSXP, np.asarray(table.shape, np.int64)
                        ),
                        "dimnames": RObj(
                            VECSXP,
                            [states[node]]
                            + [states[p] for p in parents],
                        ),
                    },
                ),
            }
            continue
        disc_par = clg.disc_parents(node)
        cont_par = clg.cont_parents(node)
        n_reg = len(clg.bias[node])
        nrow = 1 + len(cont_par)
        mat = np.zeros((nrow, n_reg), np.float64)
        sd = np.zeros((n_reg,), np.float64)
        for col in range(n_reg):
            # expand.grid order: first discrete parent varies fastest
            rem, assign = col, {}
            for p_ in disc_par:
                assign[p_] = rem % clg.cards[p_]
                rem //= clg.cards[p_]
            r = clg.regime_index(node, assign)
            mat[0, col] = clg.bias[node][r]
            for k in range(len(cont_par)):
                mat[1 + k, col] = clg.weights[node][r][k]
            sd[col] = clg.sigma[node][r]
        entry = {
            "node": node,
            "parents": list(parents),
            "children": children[node],
            "coefficients": RObj(
                REALSXP,
                mat.reshape(-1, order="F"),
                attributes={
                    "dim": RObj(
                        INTSXP, np.asarray([nrow, n_reg], np.int64)
                    ),
                    "dimnames": RObj(
                        VECSXP,
                        [
                            ["(Intercept)"] + cont_par,
                            [str(c) for c in range(n_reg)],
                        ],
                    ),
                },
            ),
            "sd": sd,
            "dparents": np.asarray(
                [parents.index(p_) + 1 for p_ in disc_par], np.int64
            ),
            "gparents": np.asarray(
                [parents.index(p_) + 1 for p_ in cont_par], np.int64
            ),
            "dlevels": RObj(VECSXP, [states[p_] for p_ in disc_par]),
        }
        if not disc_par:
            # plain gnode form for purely-continuous parents
            entry["coefficients"] = RObj(
                REALSXP,
                np.concatenate(
                    [
                        [clg.bias[node][0]],
                        np.asarray(clg.weights[node][0], np.float64),
                    ]
                ),
                attributes={
                    "names": RObj(
                        STRSXP, ["(Intercept)"] + cont_par
                    )
                },
            )
            entry["sd"] = np.asarray([clg.sigma[node][0]], np.float64)
            del entry["dparents"], entry["gparents"], entry["dlevels"]
        fit[node] = entry
    w = _Writer()
    w.header()
    w.item(fit, attributes={"class": ["bn.fit", "bn.fit.cgnet"]})
    return gzip.compress(w.out.getvalue())
