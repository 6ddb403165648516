"""HTML entity decoding, byte-faithful to the reference engine.

Reference semantics: /root/reference/common/src/html/Entity.cpp:15-317.
All processing is over ``bytes`` so that the per-url byte-identical
extracted-text invariant holds regardless of input encoding:

* ``decode_html_string`` scans for ``&``..``;`` spans; spans that fail to
  decode are passed through *literally* (Entity.cpp:300-304).
* Named entities come from the reference's ~150-entry table; unknown names
  are invalid.
* Numeric entities: ``&#dd;`` / ``&#xhh;``; the code point is truncated to
  32 bits (the reference assigns ``unsigned long`` -> ``unsigned int``),
  values > 2**64-1 overflow ``stoul`` and are invalid, U+00A0 becomes a
  plain space, and anything > 0x10FFFF is invalid.
"""

from __future__ import annotations

# Data table transcribed from the reference entity list (values, not code):
# Entity.cpp:15-167. Keys and replacements are bytes (replacements UTF-8).
_NAMED = {
    b"amp": b"&", b"lt": b"<", b"gt": b">", b"quot": b'"', b"apos": b"'",
    b"nbsp": b" ", b"copy": "©", b"reg": "®", b"deg": "°",
    b"larr": "←", b"rarr": "→", b"uarr": "↑",
    b"darr": "↓", b"harr": "↔", b"lArr": "⇐",
    b"rArr": "⇒", b"uArr": "⇑", b"dArr": "⇓",
    b"hArr": "⇔", b"crarr": "↵", b"lsaquo": "‹",
    b"rsaquo": "›", b"laquo": "«", b"raquo": "»",
    b"middot": "·", b"bull": "•", b"hellip": "…",
    b"prime": "′", b"Prime": "″", b"sdot": "⋅",
    b"alpha": "α", b"beta": "β", b"gamma": "γ",
    b"delta": "δ", b"epsilon": "ε", b"zeta": "ζ",
    b"eta": "η", b"theta": "θ", b"iota": "ι",
    b"kappa": "κ", b"lambda": "λ", b"mu": "μ",
    b"nu": "ν", b"xi": "ξ", b"omicron": "ο",
    b"pi": "π", b"rho": "ρ", b"sigma": "σ",
    b"tau": "τ", b"upsilon": "υ", b"phi": "φ",
    b"chi": "χ", b"psi": "ψ", b"omega": "ω",
    b"Gamma": "Γ", b"Delta": "Δ", b"Theta": "Θ",
    b"Lambda": "Λ", b"Xi": "Ξ", b"Pi": "Π",
    b"Sigma": "Σ", b"Phi": "Φ", b"Psi": "Ψ",
    b"Omega": "Ω",
    b"minus": "−", b"plusmn": "±", b"times": "×",
    b"divide": "÷", b"frasl": "⁄", b"sum": "∑",
    b"prod": "∏", b"not": "¬", b"part": "∂",
    b"forall": "∀", b"exist": "∃", b"empty": "∅",
    b"isin": "∈", b"notin": "∉", b"ni": "∋",
    b"nabla": "∇", b"prop": "∝", b"infin": "∞",
    b"ang": "∠", b"asymp": "≈", b"ne": "≠",
    b"equiv": "≡", b"le": "≤", b"ge": "≥",
    b"sub": "⊂", b"sup": "⊃", b"nsub": "⊄",
    b"sube": "⊆", b"supe": "⊇", b"int": "∫",
    b"radic": "√", b"lceil": "⌈", b"rceil": "⌉",
    b"lfloor": "⌊", b"rfloor": "⌋",
    b"dollar": b"$", b"curren": "¤", b"euro": "€",
    b"pound": "£", b"yen": "¥", b"cent": "¢",
    b"trade": "™", b"permil": "‰", b"loz": "◊",
    b"spades": "♠", b"clubs": "♣", b"hearts": "♥",
    b"diams": "♦", b"sect": "§", b"para": "¶",
    b"dagger": "†", b"Dagger": "‡",
    b"ensp": " ", b"emsp": " ", b"thinsp": " ",
    b"ndash": "–", b"mdash": "—", b"sbquo": "‚",
    b"bdquo": "„", b"ldquo": b'"', b"rdquo": b'"',
    b"lsquo": b"'", b"rsquo": b"'", b"tilde": "˜",
    b"circ": "ˆ", b"brvbar": "¦", b"frac14": "¼",
    b"frac12": "½", b"frac34": "¾", b"iquest": "¿",
    b"iexcl": "¡", b"micro": "µ",
}
NAMED_ENTITIES: dict[bytes, bytes] = {
    k: (v.encode("utf-8") if isinstance(v, str) else v) for k, v in _NAMED.items()
}

_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")
_DEC_DIGITS = frozenset(b"0123456789")
_ULONG_MAX = 2**64 - 1


def _decode_numeric(content: bytes) -> bytes | None:
    # content starts with b'#'; Entity.cpp:178-251
    content = content[1:]
    if not content:
        return None
    if content[:1] in (b"x", b"X"):
        content = content[1:]
        if not content or any(c not in _HEX_DIGITS for c in content):
            return None
        code_point = int(content, 16)
    else:
        if any(c not in _DEC_DIGITS for c in content):
            return None
        code_point = int(content)
    if code_point > _ULONG_MAX:  # stoul out_of_range
        return None
    code_point &= 0xFFFFFFFF  # unsigned long -> unsigned int truncation
    if code_point == 0xA0:
        return b" "
    if code_point <= 0x7F:
        return bytes((code_point,))
    if code_point <= 0x7FF:
        return bytes((0xC0 | (code_point >> 6), 0x80 | (code_point & 0x3F)))
    if code_point <= 0xFFFF:
        return bytes((
            0xE0 | (code_point >> 12),
            0x80 | ((code_point >> 6) & 0x3F),
            0x80 | (code_point & 0x3F),
        ))
    if code_point <= 0x10FFFF:
        return bytes((
            0xF0 | (code_point >> 18),
            0x80 | ((code_point >> 12) & 0x3F),
            0x80 | ((code_point >> 6) & 0x3F),
            0x80 | (code_point & 0x3F),
        ))
    return None


def decode_html_entity(entity: bytes) -> bytes | None:
    """Decode one ``&...;`` span; None when invalid (caller keeps it literal)."""
    if len(entity) < 3:
        return None
    if entity[:1] != b"&" or entity[-1:] != b";":
        return None
    content = entity[1:-1]
    if not content:
        return None
    if content[:1] == b"#":
        return _decode_numeric(content)
    return NAMED_ENTITIES.get(content)


def decode_html_string(s: bytes) -> bytes:
    """Decode all entity spans in ``s``; invalid spans pass through literally."""
    if b"&" not in s:
        return s
    out = []
    start = 0
    n = len(s)
    while start < n:
        amp = s.find(b"&", start)
        if amp == -1:
            break
        semi = s.find(b";", amp)
        if semi == -1:
            break
        entity = s[amp : semi + 1]
        out.append(s[start:amp])
        decoded = decode_html_entity(entity)
        out.append(decoded if decoded is not None else entity)
        start = semi + 1
    if start < n:
        out.append(s[start:])
    return b"".join(out)
