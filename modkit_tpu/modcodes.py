"""Modification-code vocabulary and DNA base algebra.

Semantics mirror reference ``src/mod_base_code.rs``: mod codes are either a
single character (``ModCodeRepr::Code``) or a numeric ChEBI id
(``ModCodeRepr::ChEbi``); ordering puts ChEBI codes before character codes
(mod_base_code.rs:142-151), which drives bedMethyl row ordering.

We represent a mod code as a plain Python value: ``str`` of length >= 1 for
character codes, ``int`` for ChEBI codes. Helper functions below provide
parsing, ordering keys, and the base association table.
"""

from __future__ import annotations

ModCode = "str | int"

# Cytosine mods (mod_base_code.rs:21-27)
METHYL_CYTOSINE = "m"
HYDROXY_METHYL_CYTOSINE = "h"
FORMYL_CYTOSINE = "f"
CARBOXY_CYTOSINE = "c"
FOUR_METHYL_CYTOSINE = 21839
ANY_CYTOSINE = "C"
# Adenine mods
SIX_METHYL_ADENINE = "a"
ANY_ADENINE = "A"
INOSINE = 17596
# Thymine/uracil mods
HYDROXY_METHYL_URACIL = "g"
FORMYL_URACIL = "e"
CARBOXY_URACIL = "b"
ANY_THYMINE = "T"
PSEUDOURIDINE = 17802
DEOXY_URACIL = 16450
# Guanine mods
OXO_GUANINE = "o"
ANY_GUANINE = "G"

ANY_MOD_CODES = (ANY_ADENINE, ANY_CYTOSINE, ANY_GUANINE, ANY_THYMINE)

SUPPORTED_CODES = (
    METHYL_CYTOSINE, HYDROXY_METHYL_CYTOSINE, FORMYL_CYTOSINE,
    CARBOXY_CYTOSINE, FOUR_METHYL_CYTOSINE, ANY_CYTOSINE,
    SIX_METHYL_ADENINE, ANY_ADENINE, INOSINE,
    HYDROXY_METHYL_URACIL, FORMYL_URACIL, CARBOXY_URACIL, ANY_THYMINE,
    PSEUDOURIDINE, OXO_GUANINE, ANY_GUANINE, DEOXY_URACIL,
)

MOD_CODE_TO_DNA_BASE = {
    METHYL_CYTOSINE: "C", HYDROXY_METHYL_CYTOSINE: "C", FORMYL_CYTOSINE: "C",
    CARBOXY_CYTOSINE: "C", FOUR_METHYL_CYTOSINE: "C", ANY_CYTOSINE: "C",
    SIX_METHYL_ADENINE: "A", ANY_ADENINE: "A", INOSINE: "A",
    HYDROXY_METHYL_URACIL: "T", FORMYL_URACIL: "T", CARBOXY_URACIL: "T",
    PSEUDOURIDINE: "T", ANY_THYMINE: "T", OXO_GUANINE: "G",
    ANY_GUANINE: "G", DEOXY_URACIL: "T",
}

_COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A"}

DNA_BASES = ("A", "C", "G", "T")
DNA_BASE_IDX = {b: i for i, b in enumerate(DNA_BASES)}
DNA_IDX_COMPLEMENT = (3, 2, 1, 0)  # A<->T, C<->G as indices


def parse_mod_code(raw: str) -> ModCode:
    """reference mod_base_code.rs:115 ModCodeRepr::parse."""
    if len(raw) == 1:
        return raw
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"failed to parse mod code {raw!r}")


def mod_code_sort_key(code: ModCode):
    """Ordering key matching ModCodeRepr's Ord: ChEbi(int) < Code(char),
    ints numerically, chars by codepoint (mod_base_code.rs:142-151)."""
    if isinstance(code, int):
        return (0, code, "")
    return (1, 0, code)


def format_mod_code(code: ModCode) -> str:
    return str(code)


def any_mod_code(dna_base: str) -> ModCode:
    """The 'any modification' code for a primary base is the base char itself
    (mod_base_code.rs:137-139)."""
    return dna_base


def complement(base: str) -> str:
    return _COMPLEMENT[base]


def code_matches_base(code: ModCode, dna_base: str) -> bool:
    b = MOD_CODE_TO_DNA_BASE.get(code)
    return b == dna_base
