"""Solidity ABI type grammar: parsing, canonicalization, layout rules.

Implements the public Solidity ABI spec (head/tail encoding) type
algebra used by the EVM decode compiler (operators/decode_evm.py) and
the topic0 canonicalizer (functions/crypto.py). The reference gets all
of this from its closed Rust core (reference
steps/evm_decode_events.py:19-26); here it is ~100 lines of pure
Python that runs at query-compile time only.

Grammar: base types (uintN/intN/address/bool/bytesN/bytes/string),
arrays ``T[]`` / ``T[k]`` (nested allowed), tuples ``(T1,...,Tn)``.
"""

from __future__ import annotations

import re

_BASE_TYPE_RE = re.compile(r"^[a-z]+[0-9]*")
_ARRAY_SUFFIX_RE = re.compile(r"^((?:\[\d*\])*)")


def split_top_level(body: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_type(s: str) -> tuple[str, str]:
    """Consume one (possibly tuple/array) type from the front of ``s``;
    returns (canonical_type, rest). Canonical form strips member names
    and whitespace: '(address to, uint256 amt)[]' -> '(address,uint256)[]'.
    """
    s = s.lstrip()
    if s.startswith("("):
        depth = 0
        end = -1
        for j, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = j
                    break
        if end < 0:
            raise ValueError(f"unbalanced parentheses in ABI type: {s!r}")
        members = []
        for part in split_top_level(s[1:end]):
            t, _trailing_name = parse_type(part)
            members.append(t)
        canon = "(" + ",".join(members) + ")"
        rest = s[end + 1 :]
    else:
        m = _BASE_TYPE_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse ABI type: {s!r}")
        canon = m.group(0)
        rest = s[m.end() :]
    m = _ARRAY_SUFFIX_RE.match(rest)
    canon += m.group(1)
    return canon, rest[m.end() :]


def type_structure(abi_type: str):
    """('array', elem_type, size|None) | ('tuple', [member_types]) |
    ('base', abi_type)."""
    if abi_type.endswith("]"):
        i = abi_type.rindex("[")
        size = abi_type[i + 1 : -1]
        return ("array", abi_type[:i], int(size) if size else None)
    if abi_type.startswith("("):
        return ("tuple", split_top_level(abi_type[1:-1]), None)
    return ("base", abi_type, None)


def is_dynamic(abi_type: str) -> bool:
    kind, inner, size = type_structure(abi_type)
    if kind == "base":
        return inner in ("string", "bytes")
    if kind == "array":
        return size is None or is_dynamic(inner)
    return any(is_dynamic(m) for m in inner)


def head_words(abi_type: str) -> int:
    """Number of 32-byte words this type occupies in its enclosing head
    section (dynamic types hold a 1-word offset; static composites are
    inlined recursively)."""
    if is_dynamic(abi_type):
        return 1
    kind, inner, size = type_structure(abi_type)
    if kind == "array":
        return size * head_words(inner)
    if kind == "tuple":
        return sum(head_words(m) for m in inner)
    return 1
