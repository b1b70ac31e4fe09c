"""Double-metaphone phonetic hashing (reference: src/phonetic_manager.c,
deps/phonetics double_metaphone.cpp).

A compact implementation of Lawrence Philips' Double Metaphone covering the
primary code rules.  Implemented from the published algorithm description.
Used for PHONETIC(dm:en) TEXT fields: index time adds '\\x01'+code terms,
query time expands tokens the same way, so words that sound alike match.
"""

from __future__ import annotations

_VOWELS = set("AEIOUY")


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in _VOWELS


def _slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def dm_code(word: str, max_len: int = 12) -> str:
    """Primary double-metaphone code of `word` (uppercase consonant string)."""
    s = "".join(c for c in word.upper() if c.isalpha())
    if not s:
        return ""
    n = len(s)
    out: list[str] = []
    i = 0

    # skip silent initial letters
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if s[0] == "X":
        out.append("S")
        i = 1

    while i < n and len(out) < max_len:
        c = s[i]
        nxt = s[i + 1] if i + 1 < n else ""
        prv = s[i - 1] if i > 0 else ""

        if c in _VOWELS:
            if i == 0:
                out.append("A")
            i += 1
        elif c == "B":
            out.append("P")
            i += 2 if nxt == "B" else 1
        elif c == "C":
            if s[i:i + 2] == "CH":
                out.append("X" if i > 0 else "K")
                i += 2
            elif s[i:i + 2] in ("CI", "CE", "CY"):
                out.append("S")
                i += 2
            elif s[i:i + 2] == "CC" and s[i + 2:i + 3] in ("I", "E", "H"):
                out.append("KS")
                i += 3
            else:
                out.append("K")
                i += 2 if nxt in ("C", "K", "Q") else 1
        elif c == "D":
            if s[i:i + 2] == "DG":
                if s[i + 2:i + 3] in ("I", "E", "Y"):
                    out.append("J")
                    i += 3
                else:
                    out.append("TK")
                    i += 2
            else:
                out.append("T")
                i += 2 if nxt in ("D", "T") else 1
        elif c == "F":
            out.append("F")
            i += 2 if nxt == "F" else 1
        elif c == "G":
            if nxt == "H":
                if i > 0 and not _is_vowel(s, i - 1):
                    out.append("K")
                elif i == 0:
                    out.append("J" if s[i + 2:i + 3] == "I" else "K")
                # else silent (laugh, night)
                i += 2
            elif nxt == "N":
                if i == 0:
                    out.append("KN")
                else:
                    out.append("N")
                i += 2
            elif nxt in ("I", "E", "Y"):
                out.append("J" if not _slavo_germanic(s) else "K")
                i += 2
            else:
                out.append("K")
                i += 2 if nxt == "G" else 1
        elif c == "H":
            # keep h between vowels or at start before vowel
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                out.append("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if s[i:i + 4] == "JOSE" or s[:4] == "SAN ":
                out.append("H")
            else:
                out.append("J")
            i += 2 if nxt == "J" else 1
        elif c == "K":
            out.append("K")
            i += 2 if nxt == "K" else 1
        elif c == "L":
            out.append("L")
            i += 2 if nxt == "L" else 1
        elif c == "M":
            out.append("M")
            if s[i - 1:i + 3] == "UMB" and (i + 2 == n - 1 or
                                            s[i + 3:i + 5] == "ER"):
                i += 2
            else:
                i += 2 if nxt == "M" else 1
        elif c == "N":
            out.append("N")
            i += 2 if nxt == "N" else 1
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 2
            else:
                out.append("P")
                i += 2 if nxt in ("P", "B") else 1
        elif c == "Q":
            out.append("K")
            i += 2 if nxt == "Q" else 1
        elif c == "R":
            out.append("R")
            i += 2 if nxt == "R" else 1
        elif c == "S":
            if s[i:i + 2] == "SH":
                out.append("X")
                i += 2
            elif s[i:i + 3] in ("SIO", "SIA"):
                out.append("S" if _slavo_germanic(s) else "X")
                i += 3
            elif s[i:i + 2] in ("SC",):
                if s[i + 2:i + 3] == "H":
                    out.append("X")
                    i += 3
                elif s[i + 2:i + 3] in ("I", "E", "Y"):
                    out.append("S")
                    i += 3
                else:
                    out.append("SK")
                    i += 2
            else:
                out.append("S")
                i += 2 if nxt in ("S", "Z") else 1
        elif c == "T":
            if s[i:i + 2] == "TH" or s[i:i + 3] == "TTH":
                out.append("0")
                i += 2
            elif s[i:i + 3] in ("TIA", "TIO", "TCH"):
                out.append("X")
                i += 3
            else:
                out.append("T")
                i += 2 if nxt in ("T", "D") else 1
        elif c == "V":
            out.append("F")
            i += 2 if nxt == "V" else 1
        elif c == "W":
            if i == 0 and _is_vowel(s, i + 1):
                out.append("A")
            i += 1
        elif c == "X":
            out.append("KS")
            i += 2 if nxt in ("C", "X") else 1
        elif c == "Z":
            if nxt == "H":
                out.append("J")
                i += 2
            else:
                out.append("S")
                i += 2 if nxt == "Z" else 1
        else:
            i += 1

    return "".join(out)[:max_len]
