"""Entity validation / filtering after model prediction.

Reference semantics: internal/core/postprocess.go:10-176 (``FilterEntities``
plus per-label validators). Sequential scan over the model's emission order:

* PHONENUMBER / CARD_NUMBER / SSN: merge runs of adjacent same-label spans
  (gap of 0 or 1 bytes) and keep the whole run only if the merged text
  validates (phone: 7-15 digits + regex; card: 12-19 digits + Luhn;
  SSN: exactly 9 digits + regex).
* EMAIL: local part >= 2 chars, domain >= 2 chars with a dot or "localhost".
* CREDIT_SCORE: 2-3 digit number with both "credit" and "score" (lowercased)
  within +/-20 bytes of surrounding context.
* Any other label passes through unchanged.

All regexes run on UTF-8 bytes so ``\\b``/``\\d`` are ASCII, matching Go RE2.
"""

from __future__ import annotations

import re

from .entity import Entity

# postprocess.go:11-17
PHONE_RE = re.compile(
    rb"(?:\+?[0-9]{1,3}[ .-]?)?"
    rb"(?:\(?[0-9]{1,3}\)?[ .-]?)?"
    rb"(?:[0-9]{1,3}[ .-]?){1,3}"
    rb"[0-9]{1,4}"
    rb"(?: *(?:x|ext|extension) *[0-9]{1,6})?"
)

# postprocess.go:19
CREDIT_SCORE_RE = re.compile(rb"\b[0-9]{2,3}\b")

# postprocess.go:21-23
SSN_RE = re.compile(rb"(?:[0-9]{3}[- .][0-9]{2}[- .][0-9]{4}|[0-9]{9})")

_DIGITS_RE = re.compile(rb"[0-9]")


def strip_non_digits(s: bytes) -> bytes:
    # Go uses unicode.IsDigit (decimal digits in any script); our inputs are
    # validated with ASCII regexes afterwards, so ASCII extraction suffices
    # for byte-identical behavior on the validator paths.
    return b"".join(_DIGITS_RE.findall(s))


def luhn_valid(digits: bytes) -> bool:
    """postprocess.go:162-176 (parity based on length, scanning left->right)."""
    total = 0
    parity = len(digits) % 2
    for i, ch in enumerate(digits):
        d = ch - 0x30
        if i % 2 == parity:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def is_valid_ssn(ssn: bytes) -> bool:
    digits = strip_non_digits(ssn)
    if len(digits) != 9:
        return False
    return SSN_RE.search(ssn) is not None


def is_valid_phone(num: bytes) -> bool:
    digits = strip_non_digits(num)
    if len(digits) < 7 or len(digits) > 15:
        return False
    return PHONE_RE.search(num) is not None


def is_valid_card(num: bytes) -> bool:
    digits = strip_non_digits(num)
    if len(digits) < 12 or len(digits) > 19:
        return False
    return luhn_valid(digits)


def is_valid_credit_score(score: bytes, full: bytes, start: int, end: int) -> bool:
    if CREDIT_SCORE_RE.search(score) is None:
        return False
    ctx_start = max(0, start - 20)
    ctx_end = min(len(full), end + 20)
    ctx = (full[ctx_start:start] + full[end:ctx_end]).lower()
    return b"credit" in ctx and b"score" in ctx


def is_valid_email(email: str) -> bool:
    parts = email.split("@", 1)
    if len(parts) != 2:
        return False
    local, domain = parts
    if len(local) < 2 or len(domain) < 2:
        return False
    if domain.lower() == "localhost":
        return True
    return "." in domain


_MERGEABLE = ("PHONENUMBER", "CARD_NUMBER", "SSN")
_VALIDATORS = {
    "PHONENUMBER": is_valid_phone,
    "CARD_NUMBER": is_valid_card,
    "SSN": is_valid_ssn,
}


def filter_entities(full_text: bytes, entities: list[Entity]) -> list[Entity]:
    """postprocess.go:26-94 — validate/merge spans in emission order."""
    out: list[Entity] = []
    n = len(entities)
    i = 0
    while i < n:
        ent = entities[i]
        lbl = ent.label

        if lbl in _MERGEABLE:
            group_start = ent.start
            group_end = ent.end
            j = i + 1
            while j < n and entities[j].label == lbl:
                prev_end = entities[j - 1].end
                next_start = entities[j].start
                if next_start == prev_end or next_start == prev_end + 1:
                    group_end = entities[j].end
                    j += 1
                else:
                    break
            merged = full_text[group_start:group_end]
            if _VALIDATORS[lbl](merged):
                out.extend(entities[i:j])
            i = j
        elif lbl == "EMAIL":
            if is_valid_email(ent.text):
                out.append(ent)
            i += 1
        elif lbl == "CREDIT_SCORE":
            if is_valid_credit_score(
                ent.text.encode("utf-8"), full_text, ent.start, ent.end
            ):
                out.append(ent)
            i += 1
        else:
            out.append(ent)
            i += 1

    return out
