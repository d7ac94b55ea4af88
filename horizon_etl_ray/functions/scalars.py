"""Scalar normalization / parsing kernels.

Semantics mirror the reference's shared scalar library (behavioral parity
targets, not copied code):
  - normalize_text / build_identity_key:
      /root/reference/src/core/logic/initiative_identity.py:6-41
  - normalize_name / canonicalize_name:
      /root/reference/src/core/logic/person_matcher.py:74-116
  - date / currency / truthy / name-list parsing:
      /root/reference/src/core/logic/strategies/base.py:78-116,
      /root/reference/src/core/logic/strategies/sigpesq_advisorships.py:123-144
  - PII anonymization (idempotent, salted sha256 surrogates):
      /root/reference/src/core/logic/pii_anonymizer.py:24-41
  - stable_hash (canonical-JSON sha256):
      /root/reference/src/tracking/recorder.py:36-40

These run per value; the hot path uses the vectorized wrappers in
``hashing.py`` / stage code instead of Python loops where possible.
"""

from __future__ import annotations

import hashlib
import json
import math
import re
import unicodedata
from datetime import date, datetime
from typing import Any

_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_NON_UPPER_ALPHA = re.compile(r"[^A-Z\s]+")
_WS = re.compile(r"\s+")
_DIGIT_RUN = re.compile(r"(\d+)")
_NAME_PARTICLES = {"de", "da", "do", "das", "dos", "e"}

_DATE_FORMATS = ("%d/%m/%Y", "%Y-%m-%d", "%d-%m-%Y", "%Y/%m/%d", "%d.%m.%Y")

_TRUTHY = {"1", "true", "t", "yes", "y", "sim", "s", "x", "verdadeiro"}
_FALSY = {"", "0", "false", "f", "no", "n", "nao", "não", "falso", "none", "null", "nan"}


def strip_accents(text: str) -> str:
    """NFD-decompose and drop combining marks."""
    return "".join(
        c for c in unicodedata.normalize("NFD", text) if not unicodedata.combining(c)
    )


def normalize_text(text: Any) -> str:
    """Accent-strip, lowercase, non-alphanumerics→space, collapse whitespace.

    Parity: initiative_identity.py:6-13.
    """
    if text is None:
        return ""
    s = strip_accents(str(text)).lower()
    s = _NON_ALNUM.sub(" ", s)
    return _WS.sub(" ", s).strip()


def build_identity_key(*parts: Any) -> str:
    """Normalize each part and join the non-empty ones with ``|``.

    Parity: initiative_identity.py:16-19. The CDC engine's key is
    ``build_identity_key(repo, path)`` conceptually; on the hot path the raw
    ``(repo, path)`` tuple is used directly (already canonical).
    """
    normed = [normalize_text(p) for p in parts]
    return "|".join(p for p in normed if p)


def normalize_code(value: Any) -> str:
    """Extract the first digit run (e.g. '  PJ-0012/a' → '0012').

    Parity: initiative_identity.py:22-27.
    """
    if value is None:
        return ""
    m = _DIGIT_RUN.search(str(value))
    return m.group(1) if m else ""


def normalize_name(name: Any) -> str:
    """Accent-strip, uppercase, non-letters→space, collapse whitespace.

    Parity: person_matcher.py:74-92 (e.g. 'Pãulo Sérgio Junior' →
    'PAULO SERGIO JUNIOR').
    """
    if name is None:
        return ""
    s = strip_accents(str(name)).upper()
    s = _NON_UPPER_ALPHA.sub(" ", s)
    return _WS.sub(" ", s).strip()


def canonicalize_name(name: Any) -> str:
    """Stable person key: normalized name with particles lowercased.

    Parity: person_matcher.py:94-116.
    """
    out = []
    for tok in normalize_name(name).split(" "):
        low = tok.lower()
        out.append(low if low in _NAME_PARTICLES else tok)
    return " ".join(t for t in out if t)


def parse_date(value: Any) -> date | None:
    """Multi-format date parse; datetime/date pass-through; junk → None.

    Parity: strategies/base.py:85-106 (5 formats).
    """
    if value is None:
        return None
    if isinstance(value, datetime):
        return value.date()
    if isinstance(value, date):
        return value
    if isinstance(value, float) and math.isnan(value):
        return None
    s = str(value).strip()
    if not s or s.lower() == "nan":
        return None
    for fmt in _DATE_FORMATS:
        try:
            return datetime.strptime(s, fmt).date()
        except ValueError:
            continue
    return None


def parse_currency(value: Any) -> float:
    """Comma-decimal currency string → float; errors → 0.0.

    Parity: strategies/base.py:108-116.
    """
    if value is None:
        return 0.0
    if isinstance(value, (int, float)):
        return 0.0 if (isinstance(value, float) and math.isnan(value)) else float(value)
    s = str(value).strip().replace("R$", "").replace(" ", "")
    if not s:
        return 0.0
    # pt-BR style '1.234,56' → '1234.56'
    if "," in s:
        s = s.replace(".", "").replace(",", ".")
    try:
        return float(s)
    except ValueError:
        return 0.0


def parse_truthy(value: Any) -> bool:
    """Truthy parse incl. pt-BR 'sim'/'nao'.

    Parity: sigpesq_advisorships.py:123-144.
    """
    if value is None:
        return False
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return bool(value) and not (isinstance(value, float) and math.isnan(value))
    s = strip_accents(str(value).strip().lower())
    if s in _TRUTHY:
        return True
    if s in _FALSY:
        return False
    return False


def parse_names(value: Any) -> list[str]:
    """Split a semicolon-separated name list, strip blanks.

    Parity: strategies/base.py:78-83.
    """
    if value is None:
        return []
    return [p.strip() for p in str(value).split(";") if p.strip()]


# --- PII anonymization (idempotent surrogates) -----------------------------

_ANON_SALT = "horizon-lgpd-salt"
_CPF_PREFIX = "LGPD-"
_ANON_EMAIL_DOMAIN = "@anon.lgpd"
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")


def anonymize_cpf(cpf: Any, salt: str = _ANON_SALT) -> str | None:
    """Salted sha256 surrogate 'LGPD-<16hex>'; already-anonymized passes through.

    Parity: pii_anonymizer.py:24-33 (idempotence is load-bearing for replay).
    """
    if cpf is None:
        return None
    s = str(cpf)
    if s.startswith(_CPF_PREFIX):
        return s
    digest = hashlib.sha256(f"{salt}:{s}".encode()).hexdigest()[:16]
    return f"{_CPF_PREFIX}{digest}"


def anonymize_email(email: Any, salt: str = _ANON_SALT) -> str | None:
    """Salted sha256 surrogate '<12hex>@anon.lgpd'; idempotent.

    Parity: pii_anonymizer.py:35-41.
    """
    if email is None:
        return None
    s = str(email)
    if s.endswith(_ANON_EMAIL_DOMAIN):
        return s
    digest = hashlib.sha256(f"{salt}:{s.lower()}".encode()).hexdigest()[:12]
    return f"{digest}{_ANON_EMAIL_DOMAIN}"


def scrub_text_pii(text: Any, salt: str = _ANON_SALT) -> str:
    """Replace every email-looking substring with its anonymized surrogate.

    Parity: pii_anonymizer.py:60-76 (recursive payload scrub, string leaf).
    """
    if text is None:
        return ""
    return _EMAIL_RE.sub(lambda m: anonymize_email(m.group(0), salt), str(text))


# --- canonical hashing -----------------------------------------------------


def _json_default(obj: Any) -> Any:
    if isinstance(obj, (datetime, date)):
        return obj.isoformat()
    return str(obj)


def stable_hash(payload: Any) -> str:
    """sha256 of canonical JSON (sorted keys, iso dates).

    Parity: recorder.py:36-40 — the engine's lineage payload hash.
    """
    blob = json.dumps(payload, sort_keys=True, default=_json_default, ensure_ascii=False)
    return hashlib.sha256(blob.encode()).hexdigest()


def sha256_hex(data: bytes | str | None) -> str:
    """Plain content sha256 (the per-row invariant vs the reference oracle)."""
    if data is None:
        return ""
    if isinstance(data, str):
        data = data.encode()
    return hashlib.sha256(data).hexdigest()
