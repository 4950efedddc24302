"""Deterministic synthesized NER training/eval data for the 19-tag vocab.

The reference's production CNN+CRF ships AES-encrypted weights
(internal/core/onnx.go:155-196) that cannot be redistributed, so this repo
trains its own small emission model (SURVEY §7.3(5)) on data synthesized
here: label-consistent sentences over the IDX2TAG vocabulary
(internal/core/onnx.go:33-38), with surface shapes chosen to be
discriminable the way the real entity types are (digit patterns, @ marks,
URL schemes, lexicons). Everything is a pure function of the seed.

Words never carry punctuation adjacent to whitespace, so the reference
cleaning pass (preprocess.go:9-60) is an identity on these sentences and
word<->label alignment survives the full predict path.
"""

from __future__ import annotations

import random

FIRST_NAMES = [
    "Leo", "Sonia", "Zoe", "Jurgen", "Aiko", "Carlos", "Fatima", "Olamide",
    "Chloe", "Ivan", "Bruce", "Amelia", "Elena", "Marco", "Noor", "Lucia",
    "Kofi", "Hana", "Dmitri", "Ingrid", "Rosa", "Victor", "Wendy", "Yusuf",
]
LAST_NAMES = [
    "Morgan", "Russell", "Faulkner", "Muller", "Tanaka", "Perez", "Okoro",
    "Dubois", "Ivanov", "Lee", "Smith", "Garcia", "Chen", "Haddad",
    "Novak", "Okafor", "Silva", "Kowalski", "Berg", "Costa",
]
CITIES = [
    "Boston", "Springfield", "Munich", "Lagos", "Dublin", "Moscow",
    "Tokyo", "Bogota", "Marseille", "Dubai", "Oslo", "Lima", "Accra",
    "Porto", "Quito", "Riga",
]
COMPANY_SUFFIXES = ["Corp", "Ltd", "Inc", "Labs", "Group", "GmbH"]
GENDERS = ["male", "female", "nonbinary", "woman", "man"]
ETHNICITIES = ["hispanic", "caucasian", "asian", "african", "latino", "arab"]
ORIENTATIONS = ["gay", "lesbian", "bisexual", "straight", "queer", "asexual"]
MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
URL_HOSTS = ["news.example.org", "kb.example.net", "www.archive.example.com"]
URL_PATHS = ["story", "guides", "reports", "page", "docs"]

FILLER = (
    "the committee approved proposal after lengthy debate rainfall totals "
    "exceeded seasonal averages across region library extended its opening "
    "hours for exam period local engineers unveiled prototype of new "
    "transit system volunteers planted native shrubs along riverbank trail "
    "orchestra announced program researchers published survey patterns "
    "meeting contact details available record statement noted review"
).split()


def _digits(rng: random.Random, n: int) -> str:
    return "".join(str(rng.randint(0, 9)) for _ in range(n))


def _luhn_card(rng: random.Random) -> str:
    """16-digit Luhn-valid number (postprocess.validate_card_number passes)."""
    body = [rng.randint(0, 9) for _ in range(15)]
    total = 0
    for i, d in enumerate(reversed(body)):
        if i % 2 == 0:  # positions that get doubled once the check digit lands
            d *= 2
            d = d - 9 if d > 9 else d
        total += d
    check = (10 - total % 10) % 10
    return "".join(map(str, body)) + str(check)


def _entity(rng: random.Random, tag: str) -> list[str]:
    """Surface words for one entity of type ``tag``."""
    if tag == "NAME":
        return [rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)]
    if tag == "EMAIL":
        return [
            f"{rng.choice(FIRST_NAMES).lower()}."
            f"{rng.choice(LAST_NAMES).lower()}{rng.randint(0, 99)}"
            f"@example.{rng.choice(['com', 'net', 'org'])}"
        ]
    if tag == "PHONENUMBER":
        if rng.random() < 0.5:
            return [f"{_digits(rng, 3)}-{_digits(rng, 3)}-{_digits(rng, 4)}"]
        return [f"+{rng.randint(1, 9)}-{_digits(rng, 3)}-{_digits(rng, 3)}-{_digits(rng, 4)}"]
    if tag == "SSN":
        return [f"{_digits(rng, 3)}-{_digits(rng, 2)}-{_digits(rng, 4)}"]
    if tag == "CARD_NUMBER":
        return [_luhn_card(rng)]
    if tag == "DATE":
        if rng.random() < 0.5:
            return [f"{rng.randint(1, 12)}/{rng.randint(1, 28)}/{rng.randint(1990, 2026)}"]
        return [rng.choice(MONTHS), str(rng.randint(1, 28)), str(rng.randint(1990, 2026))]
    if tag == "URL":
        return [f"https://{rng.choice(URL_HOSTS)}/{rng.choice(URL_PATHS)}/{rng.randint(1, 999)}"]
    if tag == "ADDRESS":
        return [
            str(rng.randint(1, 9999)),
            rng.choice(["Evergreen", "Abbey", "Elm", "Unity", "Mark", "Cedar"]),
            rng.choice(["Terrace", "Road", "Street", "Avenue", "Lane"]),
        ]
    if tag == "LOCATION":
        return [rng.choice(CITIES)]
    if tag == "COMPANY":
        return [rng.choice(LAST_NAMES), rng.choice(COMPANY_SUFFIXES)]
    if tag == "CREDIT_SCORE":
        return [str(rng.randint(300, 850))]
    if tag == "ID_NUMBER":
        return [f"ID{_digits(rng, 7)}"]
    if tag == "LICENSE_PLATE":
        letters = "".join(rng.choice("ABCDEFGHJKLMNPRSTUVWXYZ") for _ in range(3))
        return [f"{letters}-{_digits(rng, 4)}"]
    if tag == "SERVICE_CODE":
        return [f"sc-{_digits(rng, 4)}"]
    if tag == "VIN":
        chars = "ABCDEFGHJKLMNPRSTUVWXYZ0123456789"  # VINs exclude I/O/Q
        return ["".join(rng.choice(chars) for _ in range(17))]
    if tag == "GENDER":
        return [rng.choice(GENDERS)]
    if tag == "ETHNICITY":
        return [rng.choice(ETHNICITIES)]
    if tag == "SEXUAL_ORIENTATION":
        return [rng.choice(ORIENTATIONS)]
    raise ValueError(f"no generator for tag {tag}")


ENTITY_TAGS = [
    "NAME", "EMAIL", "PHONENUMBER", "SSN", "CARD_NUMBER", "DATE", "URL",
    "ADDRESS", "LOCATION", "COMPANY", "CREDIT_SCORE", "ID_NUMBER",
    "LICENSE_PLATE", "SERVICE_CODE", "VIN", "GENDER", "ETHNICITY",
    "SEXUAL_ORIENTATION",
]

# lexical anchors preceding certain entity types (tagged O) — gives the
# context features (prevw/nextw) real signal for shape-ambiguous types
_ANCHORS = {
    "CREDIT_SCORE": ["credit", "score"],
    "ID_NUMBER": ["id"],
    "SERVICE_CODE": ["service", "code"],
    "GENDER": ["gender"],
    "ETHNICITY": ["ethnicity"],
    "SEXUAL_ORIENTATION": ["orientation"],
    "LICENSE_PLATE": ["plate"],
    "VIN": ["vin"],
    "LOCATION": ["in"],
    "DATE": ["on"],
}


def generate_labeled_sentences(
    n: int = 2000, seed: int = 13
) -> list[list[tuple[str, str]]]:
    """``n`` sentences of (word, tag) pairs; tags from IDX2TAG (O included)."""
    rng = random.Random(seed)
    sentences: list[list[tuple[str, str]]] = []
    for i in range(n):
        words: list[tuple[str, str]] = [
            (rng.choice(FILLER), "O") for _ in range(rng.randint(3, 8))
        ]
        for j in range(rng.randint(1, 3)):
            # round-robin base tag + random extras: every type is covered
            tag = (
                ENTITY_TAGS[i % len(ENTITY_TAGS)]
                if j == 0
                else rng.choice(ENTITY_TAGS)
            )
            pos = rng.randrange(len(words) + 1)
            ent = [(w, tag) for w in _entity(rng, tag)]
            anchor = [(w, "O") for w in _ANCHORS.get(tag, [])]
            words[pos:pos] = anchor + ent
        # a few trailing filler words so entities aren't always last
        words += [(rng.choice(FILLER), "O") for _ in range(rng.randint(0, 3))]
        sentences.append(words)
    return sentences
