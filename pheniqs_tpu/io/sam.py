"""SAM text emission: header atoms (@HD/@RG/@PG) and alignment records
with the auxiliary tag block in the reference's fixed order (reference
atom.cpp HeadRGAtom emission, auxiliary.cpp:321-359).

Float tags (XB/XM/XC/XO/EE) print with C `%g` semantics from a float32
value, matching htslib's aux formatting.
"""

from __future__ import annotations

import numpy as np

from ..iupac import BAM_TO_ASCII

# SAM flag bits
FLAG_PAIRED = 0x1
FLAG_UNMAP = 0x4
FLAG_MUNMAP = 0x8
FLAG_REVERSE = 0x10
FLAG_READ1 = 0x40
FLAG_READ2 = 0x80
FLAG_QCFAIL = 0x200

RG_FIELD_ORDER = (
    "ID",
    "BC",
    "CN",
    "DS",
    "DT",
    "FO",
    "KS",
    "LB",
    "PG",
    "PI",
    "PL",
    "PM",
    "PU",
    "SM",
)

PG_FIELD_ORDER = ("ID", "PN", "CL", "PP", "DS", "VN")

HD_DEFAULT = {"VN": "1.0", "SO": "unknown", "GO": "query"}


_FLOAT_TAG_CACHE: dict[float, str] = {}


def format_float_tag(value: float) -> str:
    """htslib prints float aux values with %g from a float32.

    Memoized: confidence values cluster heavily (identical quality strings
    produce identical posteriors), so the cache hit rate is high."""
    cached = _FLOAT_TAG_CACHE.get(value)
    if cached is None:
        if len(_FLOAT_TAG_CACHE) > 1 << 20:
            _FLOAT_TAG_CACHE.clear()
        cached = "%g" % np.float32(value)
        _FLOAT_TAG_CACHE[value] = cached
    return cached


def head_HD_line(hd: dict | None = None) -> str:
    hd = {**HD_DEFAULT, **(hd or {})}
    fields = ["@HD", f"VN:{hd['VN']}"]
    if hd.get("SO"):
        fields.append(f"SO:{hd['SO']}")
    if hd.get("GO"):
        fields.append(f"GO:{hd['GO']}")
    return "\t".join(fields)


def head_RG_line(rg: dict) -> str:
    fields = ["@RG"]
    for key in RG_FIELD_ORDER:
        value = rg.get(key)
        if value not in (None, ""):
            fields.append(f"{key}:{value}")
    return "\t".join(fields)


def head_PG_line(pg: dict) -> str:
    fields = ["@PG"]
    for key in PG_FIELD_ORDER:
        value = pg.get(key)
        if value not in (None, ""):
            fields.append(f"{key}:{value}")
    return "\t".join(fields)


def rg_atoms_from_decoder(decoder: dict) -> list[dict]:
    """Read-group atoms from a compiled sample decoder: undetermined first,
    then codec order (reference atom.cpp decode vector<HeadRGAtom>)."""
    atoms = []
    undetermined = decoder.get("undetermined")
    if undetermined is None:
        return atoms
    atoms.append({k: undetermined.get(k) for k in RG_FIELD_ORDER})
    for record in decoder.get("codec", {}).values():
        atoms.append({k: record.get(k) for k in RG_FIELD_ORDER})
    return atoms


class SamHeader:
    def __init__(self, ontology: dict, program: dict | None = None):
        self.lines: list[str] = [head_HD_line()]
        sample = ontology.get("sample")
        if isinstance(sample, dict):
            for atom in rg_atoms_from_decoder(sample):
                self.lines.append(head_RG_line(atom))
        if program:
            pg = {
                "ID": program.get("ID"),
                "PN": program.get("PN"),
                "CL": program.get("CL"),
                "PP": program.get("PP"),
                "DS": program.get("DS"),
                "VN": program.get("VN"),
            }
            self.lines.append(head_PG_line(pg))

    def encode(self) -> bytes:
        return ("\n".join(self.lines) + "\n").encode()


class AuxTags:
    """Per-segment auxiliary block; emission order is fixed (reference
    auxiliary.cpp:321-359)."""

    __slots__ = (
        "FI", "TC", "FS", "RG", "PU", "LB", "PG", "CO",
        "BC", "QT", "XB",
        "RX", "QX", "OX", "BZ", "MI", "XM",
        "CB", "CR", "CY", "XC", "XO", "EE",
    )

    def __init__(self):
        self.FI = 0
        self.TC = 0
        self.FS = ""
        self.RG = ""
        self.PU = ""
        self.LB = ""
        self.PG = ""
        self.CO = ""
        self.BC = ""
        self.QT = ""
        self.XB = 0.0
        self.RX = ""
        self.QX = ""
        self.OX = ""
        self.BZ = ""
        self.MI = ""
        self.XM = 0.0
        self.CB = ""
        self.CR = ""
        self.CY = ""
        self.XC = 0.0
        self.XO = 0.0
        self.EE = 0.0

    def encode(self) -> str:
        append = [].append
        parts = append.__self__
        if self.TC > 2:
            if self.FI > 0:
                append(f"FI:i:{self.FI}")
            append(f"TC:i:{self.TC}")
        value = self.FS
        if value:
            append("FS:Z:" + value)
        value = self.RG
        if value:
            append("RG:Z:" + value)
        value = self.PU
        if value:
            append("PU:Z:" + value)
        value = self.LB
        if value:
            append("LB:Z:" + value)
        value = self.PG
        if value:
            append("PG:Z:" + value)
        value = self.CO
        if value:
            append("CO:Z:" + value)
        value = self.BC
        if value:
            append("BC:Z:" + value)
        value = self.QT
        if value:
            append("QT:Z:" + value)
        if self.XB > 0:
            append("XB:f:" + format_float_tag(self.XB))
        value = self.RX
        if value:
            append("RX:Z:" + value)
        value = self.QX
        if value:
            append("QX:Z:" + value)
        value = self.OX
        if value:
            append("OX:Z:" + value)
        value = self.BZ
        if value:
            append("BZ:Z:" + value)
        value = self.MI
        if value:
            append("MI:Z:" + value)
        if self.XM > 0:
            append("XM:f:" + format_float_tag(self.XM))
        value = self.CB
        if value:
            append("CB:Z:" + value)
        value = self.CR
        if value:
            append("CR:Z:" + value)
        value = self.CY
        if value:
            append("CY:Z:" + value)
        if self.XC > 0:
            append("XC:f:" + format_float_tag(self.XC))
        if self.XO > 0:
            append("XO:f:" + format_float_tag(self.XO))
        if self.EE > 0:
            append("EE:f:" + format_float_tag(self.EE))
        return "\t".join(parts)


def bam_codes_to_ascii(code: np.ndarray, length: int) -> str:
    if length <= 0:
        return "*"
    return BAM_TO_ASCII[code[:length]].tobytes().decode("ascii")


def quality_to_ascii(quality: np.ndarray, length: int, offset: int = 33) -> str:
    if length <= 0:
        return "*"
    return (quality[:length] + offset).astype(np.uint8).tobytes().decode("ascii")


def format_record(
    name: str,
    flag: int,
    sequence: str,
    quality: str,
    tags: AuxTags,
) -> str:
    aux = tags.encode()
    base = f"{name}\t{flag}\t*\t0\t0\t*\t*\t0\t0\t{sequence}\t{quality}"
    return base + "\t" + aux if aux else base
