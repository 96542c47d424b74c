"""WHATWG charset labels → Python codecs.

The reference decodes bodies via Go's ``htmlindex.Get`` which accepts
every WHATWG encoding label (/root/reference/libhttp/encoding.go:10-16)
and ERRORS on an unknown charset. Python's ``bytes.decode`` accepts a
different alias set (e.g. knows ``sjis`` but not ``x-sjis``), so parity
needs the explicit label table below (from the public WHATWG Encoding
Standard) and an error — not a silent utf-8 fallback — on labels
neither spec knows.

Divergences (documented, deliberate):
- ``x-user-defined`` decodes as latin-1 (Python has no U+F780 mapping);
- the WHATWG "replacement" encodings (csiso2022kr, hz-gb-2312, …)
  error out, matching their decode-to-failure semantics.
"""

from __future__ import annotations

_W = {}  # WHATWG label (lowercased) → python codec


def _add(codec: str, *labels: str) -> None:
    for lb in labels:
        _W[lb] = codec


_add("utf-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8", "utf8",
     "x-unicode20utf8")
_add("cp866", "866", "cp866", "csibm866", "ibm866")
_add("iso8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2", "iso88592",
     "iso_8859-2", "iso_8859-2:1987", "l2", "latin2")
_add("iso8859-3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3", "iso88593",
     "iso_8859-3", "iso_8859-3:1988", "l3", "latin3")
_add("iso8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4", "iso88594",
     "iso_8859-4", "iso_8859-4:1988", "l4", "latin4")
_add("iso8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144",
     "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988")
_add("iso8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i",
     "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e", "iso-8859-6-i",
     "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6", "iso_8859-6:1987")
_add("iso8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek", "greek8",
     "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597", "iso_8859-7",
     "iso_8859-7:1987", "sun_eu_greek")
_add("iso8859-8", "csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8",
     "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8",
     "iso_8859-8:1988", "visual")
_add("iso8859-8", "csiso88598i", "iso-8859-8-i", "logical")  # -i variant
_add("iso8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10",
     "iso885910", "l6", "latin6")
_add("iso8859-13", "iso-8859-13", "iso8859-13", "iso885913")
_add("iso8859-14", "iso-8859-14", "iso8859-14", "iso885914")
_add("iso8859-15", "csisolatin9", "iso-8859-15", "iso8859-15", "iso885915",
     "iso_8859-15", "l9")
_add("iso8859-16", "iso-8859-16")
_add("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
_add("koi8-u", "koi8-ru", "koi8-u")
_add("mac-roman", "csmacintosh", "mac", "macintosh", "x-mac-roman")
_add("cp874", "dos-874", "iso-8859-11", "iso8859-11", "iso885911", "tis-620",
     "windows-874")
_add("cp1250", "cp1250", "windows-1250", "x-cp1250")
_add("cp1251", "cp1251", "windows-1251", "x-cp1251")
# WHATWG maps the latin1/ascii family to windows-1252
_add("cp1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1",
     "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1",
     "iso_8859-1:1987", "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252")
_add("cp1253", "cp1253", "windows-1253", "x-cp1253")
_add("cp1254", "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148", "iso8859-9",
     "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5", "latin5", "windows-1254",
     "x-cp1254")
_add("cp1255", "cp1255", "windows-1255", "x-cp1255")
_add("cp1256", "cp1256", "windows-1256", "x-cp1256")
_add("cp1257", "cp1257", "windows-1257", "x-cp1257")
_add("cp1258", "cp1258", "windows-1258", "x-cp1258")
_add("mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
_add("gbk", "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
     "gb_2312-80", "gbk", "iso-ir-58", "x-gbk")
_add("gb18030", "gb18030")
_add("big5", "big5", "cn-big5", "csbig5", "x-x-big5")
_add("big5hkscs", "big5-hkscs")
_add("euc_jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
_add("iso2022_jp", "csiso2022jp", "iso-2022-jp")
_add("shift_jis", "csshiftjis", "ms_kanji", "shift-jis", "shift_jis", "sjis",
     "x-sjis")
_add("cp932", "ms932", "windows-31j")
_add("cp949", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean",
     "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601", "windows-949")
_add("utf-16be", "unicodefffe", "utf-16be")
_add("utf-16le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode", "unicodefeff",
     "utf-16", "utf-16le")
_add("latin-1", "x-user-defined")  # approximation, see module docstring

# the WHATWG "replacement" encoding: any decode is an error
_REPLACEMENT = {"csiso2022kr", "hz-gb-2312", "iso-2022-cn", "iso-2022-cn-ext",
                "iso-2022-kr", "replacement"}


def resolve_label(label: str) -> str | None:
    """WHATWG label → python codec name; None when unknown/replacement."""
    lb = label.strip().lower()
    if not lb or lb in _REPLACEMENT:
        return None
    codec = _W.get(lb)
    if codec is not None:
        return codec
    # a TEXT codec Python happens to know directly is still acceptable —
    # but only text: bytes-to-bytes codecs (hex, zlib, base64, rot13)
    # would make decode() raise LookupError mid-crawl on an
    # attacker-controlled charset label
    import codecs

    try:
        info = codecs.lookup(lb)
    except LookupError:
        return None
    return lb if getattr(info, "_is_text_encoding", True) else None


def decode_body(body: bytes, label: str) -> tuple[str, str]:
    """(decoded text, error). Unknown labels ERROR (BodyUTF8 parity:
    Go's htmlindex.Get fails on unsupported charsets instead of
    silently mangling); invalid byte sequences within a known codec
    replace with U+FFFD (Go transform semantics)."""
    codec = resolve_label(label or "utf-8")
    if codec is None:
        return "", f"unsupported charset: {label!r}"
    return body.decode(codec, errors="replace"), ""
