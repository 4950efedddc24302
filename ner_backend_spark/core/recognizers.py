"""Presidio-equivalent pattern recognizers (the primary stateless tagger).

Reference semantics: internal/core/presidio.go:26-243 plus the embedded
pattern config (internal/core/recognizers.yaml, re-emitted as
``recognizer_data.py``). Key behaviors replicated exactly:

* Lookaround rewrites (presidio.go:75-129): Go RE2 lacks lookarounds, so the
  reference rewrites three patterns into a base regex + a validator function
  and *skips* every other lookaround pattern. We replicate the rewritten
  behavior (NOT the original lookaround patterns) to stay bit-equal.
* The validator is stored per-recognizer and applies to matches from *all*
  of that recognizer's patterns (presidio.go:196).
* Per-recognizer dedup on (mapped_label, start, end), where the seen-set is
  populated *before* Luhn/validator checks (presidio.go:182-197).
* Patterns whose score is below the threshold (default 0.5, model.go:35) are
  skipped at recognition time (presidio.go:170).
* Label mapping presidio.go:32-45.

All regexes run on UTF-8 bytes -> byte offsets, ASCII \\b/\\w/\\d like RE2.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Optional

from .recognizer_data import RECOGNIZERS, TLDS

# presidio.go:32-45
ENTITIES_MAP = {
    "UsLicenseRecognizer": "VIN",  # AKA US_DRIVER_LICENSE
    "DateRecognizer": "DATE",
    "EmailRecognizer": "EMAIL",
    "CreditCardRecognizer": "CARD_NUMBER",
    "UsSsnRecognizer": "SSN",
    "UrlRecognizer": "URL",
    "UsPassportRecognizer": "ID_NUMBER",
    "UsItinRecognizer": "ID_NUMBER",
    "UsBankRecognizer": "ID_NUMBER",
    "InPanRecognizer": "ID_NUMBER",
    "InAadhaarRecognizer": "ID_NUMBER",
    "InVehicleRegistrationRecognizer": "VIN",
}

DEFAULT_PRESIDIO_THRESHOLD = 0.5  # model.go:35

_TLD_ALTERNATION = "(?:" + "|".join(f"(?:{t})" for t in TLDS) + ")"
_NON_DIGIT = re.compile(rb"\D")


def _pan_validate(s: bytes) -> bool:
    """presidio.go:82-93 — >=1 ASCII letter and >=4 ASCII digits."""
    letters = sum(1 for c in s if 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A)
    digits = sum(1 for c in s if 0x30 <= c <= 0x39)
    return letters >= 1 and digits >= 4


def _vehicle_i_validate(s: bytes) -> bool:
    """presidio.go:105-107 — I##### where ##### != 00000."""
    return s[1:] != b"00000"


def _vehicle_00_validate(s: bytes) -> bool:
    """presidio.go:119-121 — first two digits != 00."""
    return s[0:2] != b"00"


@dataclass
class PatternRecognizer:
    entity_type: str
    regexps: list[tuple[re.Pattern, float]] = field(default_factory=list)
    validate: Optional[Callable[[bytes], bool]] = None

    @property
    def mapped_label(self) -> str:
        return ENTITIES_MAP.get(self.entity_type) or self.entity_type

    def recognize(
        self, text: bytes, threshold: float
    ) -> list[tuple[str, int, int, float]]:
        """Yield (label, start, end, score) per presidio.go:163-209."""
        results: list[tuple[str, int, int, float]] = []
        seen: set[tuple[int, int]] = set()
        mapped = self.mapped_label
        for rx, score in self.regexps:
            if score < threshold:
                continue
            for m in rx.finditer(text):
                start, end = m.start(), m.end()
                key = (start, end)  # label is constant per recognizer
                if key in seen:
                    continue
                seen.add(key)
                match = text[start:end]
                if self.entity_type == "CreditCardRecognizer":
                    digits = _NON_DIGIT.sub(b"", match)
                    if not _presidio_luhn(digits):
                        continue
                if self.validate is not None and not self.validate(match):
                    continue
                results.append((mapped, start, end, score))
        return results


def _presidio_luhn(digits: bytes) -> bool:
    """presidio.go:147-161 — right-to-left, doubling alternate digits."""
    total, alt = 0, False
    for i in range(len(digits) - 1, -1, -1):
        n = digits[i] - 0x30
        if alt:
            n *= 2
            if n > 9:
                n -= 9
        total += n
        alt = not alt
    return total % 10 == 0


def load_recognizers() -> list[PatternRecognizer]:
    """Compile the pattern set with the reference's lookaround rewrites."""
    out: list[PatternRecognizer] = []
    for name, patterns in RECOGNIZERS:
        pr = PatternRecognizer(entity_type=name)
        for rx_text, score in patterns:
            if name == "InPanRecognizer" and "(?=" in rx_text:
                pr.regexps.append(
                    (re.compile(rb"\b[\w@#$%^?~-]{10}\b"), score)
                )
                pr.validate = _pan_validate
                continue
            if name == "InVehicleRegistrationRecognizer" and "(?!00000)" in rx_text:
                pr.regexps.append((re.compile(rb"\bI[0-9]{5}\b"), score))
                pr.validate = _vehicle_i_validate
                continue
            if name == "InVehicleRegistrationRecognizer" and "(?!00)" in rx_text:
                pr.regexps.append(
                    (re.compile(rb"\b[0-9]{2}[A-FH-KPRX][0-9]{6}[A-Z]\b"), score)
                )
                pr.validate = _vehicle_00_validate
                continue
            # Skip any other lookaround patterns (presidio.go:126-129)
            if "(?=" in rx_text or "(?!" in rx_text or "(?<" in rx_text:
                continue
            if name == "UrlRecognizer":
                rx_text = rx_text.replace("{TLD}", _TLD_ALTERNATION)
            pr.regexps.append((re.compile(rx_text.encode("utf-8")), score))
        out.append(pr)
    return out
