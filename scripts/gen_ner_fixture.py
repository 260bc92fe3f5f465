"""Generate the adversarial NER fixture (tests/fixtures/ner_adversarial.json).

Each item encodes the REFERENCE semantics of kilt2vqa placeholder
substitution (meerqat/data/kilt2vqa.py:157-227): spaCy finds the entity
MENTION, and the placeholder replaces the mention plus its syntactic
children (left_edge..right_edge — determiners, appositive nouns,
possessive markers, surrounding quotes). Golds:

- ``mention``: the core entity text (what NED computes WER against);
- ``span``: the full text the placeholder replaces under the reference's
  dep-parse expansion;
- ``category``: adversarial family, for the per-category recall table.

Deterministic: running this script rewrites the fixture byte-identically.
"""
import itertools
import json
import os

PERSONS = [
    "Elvis Presley", "Louis Armstrong", "Marie Curie", "Nelson Mandela",
    "Frida Kahlo", "Wolfgang Amadeus Mozart", "Flannery O'Connor",
    "Beyoncé", "Hayao Miyazaki", "Ada Lovelace",
]
PLACES = [
    "Portugal", "Paris", "Mount Everest", "São Paulo", "New York City",
    "Great Barrier Reef", "Lake Victoria", "Casablanca", "England",
]
WORKS = [
    "Carmen", "Mona Lisa", "Swan Lake", "War and Peace",
    "The Lady of the Lake", "Jaws", "Sophie's Choice",
    "The Lord of the Rings", "Hamlet", "Guernica",
]
ORGS = [
    "Microsoft", "The Beatles", "University of Oxford",
    "Statue of Liberty", "Coca-Cola", "Super Bowl",
]

# distractor titles in the gazetteer that must NOT fire spuriously
DISTRACTORS = ["It", "Who", "Help", "Albert Einstein", "New York",
               "Oxford", "Lake"]

TITLES = PERSONS + PLACES + WORKS + ORGS + DISTRACTORS


def item(question, mention, span, category):
    assert mention in question, (mention, question)
    assert span in question, (span, question)
    assert mention in span, (mention, span)
    return {"question": question, "mention": mention, "span": span,
            "category": category}


def build():
    items = []

    # 1. plain mid-sentence mention, no expansion -----------------------
    for e in ["Elvis Presley", "Marie Curie", "Nelson Mandela",
              "Frida Kahlo", "Ada Lovelace", "Microsoft", "Paris",
              "Portugal", "Mount Everest", "Hamlet"]:
        items.append(item(f"In what year was {e} founded?", e, e, "plain"))

    # 2. determiner phrase: det + common noun + entity ------------------
    for det, noun, e in [
        ("the", "opera", "Carmen"), ("the", "painting", "Mona Lisa"),
        ("the", "ballet", "Swan Lake"), ("the", "novel", "War and Peace"),
        ("the", "film", "Jaws"), ("this", "monument", "Statue of Liberty"),
        ("that", "mountain", "Mount Everest"),
        ("the", "band", "The Beatles"),
    ]:
        q = f"Who created {det} {noun} {e} and when?"
        items.append(item(q, e, f"{det} {noun} {e}", "determiner_phrase"))

    # 3. multi-word determiner phrase: det + adj(s) + noun + entity -----
    for mids, e in [
        ("famous portrait", "Mona Lisa"),
        ("celebrated opera", "Carmen"),
        ("epic novel", "War and Peace"),
        ("great painter", "Frida Kahlo"),
        ("very famous painting", "Mona Lisa"),      # 3 middle words
        ("long running musical", "Hamlet"),          # 3 middle words
        ("iconic soft drink", "Coca-Cola"),
    ]:
        q = f"Who is behind the {mids} {e} today?"
        items.append(item(q, e, f"the {mids} {e}", "multiword_determiner"))

    # 4. sentence-initial entity (bare and with determiner) -------------
    for e in ["Portugal", "Paris", "Microsoft", "Beyoncé", "Guernica"]:
        q = f"{e} is associated with which continent?"
        items.append(item(q, e, e, "sentence_initial"))
    for e in ["Elvis Presley", "Marie Curie", "New York City",
              "University of Oxford", "The Lord of the Rings"]:
        q = f"{e} is known for what achievement?"
        items.append(item(q, e, e, "sentence_initial"))
    items.append(item("The opera Carmen premiered in which city?",
                      "Carmen", "The opera Carmen", "sentence_initial"))
    items.append(item("The ballet Swan Lake debuted in which year?",
                      "Swan Lake", "The ballet Swan Lake",
                      "sentence_initial"))

    # 5. possessives: entity + 's (reference: 's is a child token) ------
    for e in ["Elvis Presley", "Marie Curie", "Beyoncé", "Portugal",
              "Microsoft", "Paris", "Hayao Miyazaki", "England"]:
        q = f"What is {e}'s best known work?"
        items.append(item(q, e, f"{e}'s", "possessive"))
    # unicode right-quote possessive
    for e in ["Frida Kahlo", "Nelson Mandela"]:
        q = f"Where is {e}’s birthplace?"
        items.append(item(q, e, f"{e}’s", "possessive"))
    # title that itself contains a possessive
    items.append(item("Who directed Sophie's Choice in 1982?",
                      "Sophie's Choice", "Sophie's Choice", "possessive"))
    items.append(item("Who starred in the film Sophie's Choice?",
                      "Sophie's Choice", "the film Sophie's Choice",
                      "possessive"))

    # 6. nested / overlapping titles (keep the biggest) ------------------
    items.append(item("Which borough of New York City is the largest?",
                      "New York City", "New York City", "nested"))
    items.append(item("Who attended the University of Oxford in 1920?",
                      "University of Oxford", "the University of Oxford",
                      "nested"))
    items.append(item("How deep is Lake Victoria at its center?",
                      "Lake Victoria", "Lake Victoria", "nested"))
    items.append(item("Which knight appears in The Lady of the Lake?",
                      "The Lady of the Lake", "The Lady of the Lake",
                      "nested"))

    # 7. preposition boundary: expansion must stop at 'of/in/...' -------
    for head, e in [
        ("the capital of", "Portugal"), ("the population of", "Paris"),
        ("the height of", "Mount Everest"),
        ("the founder of", "Microsoft"),
        ("the lead singer of", "The Beatles"),
    ]:
        q = f"What is {head} {e} right now?"
        items.append(item(q, e, e, "preposition_boundary"))

    # 8. quoted titles: the quotes ride with the placeholder ------------
    items.append(item(
        "Who wrote the poem ‘The Lady of the Lake’ in 1810?",
        "The Lady of the Lake", "the poem ‘The Lady of the Lake’",
        "quotes"))
    items.append(item(
        'Who composed the opera "Carmen" for the Paris stage?',
        "Carmen", 'the opera "Carmen"', "quotes"))
    items.append(item(
        "Is the musical ‘Hamlet’ still running?",
        "Hamlet", "the musical ‘Hamlet’", "quotes"))

    # 9. multiple entities in one question -------------------------------
    pairs = [("Elvis Presley", "Paris"), ("Marie Curie", "Portugal"),
             ("Beyoncé", "São Paulo"), ("Nelson Mandela", "England")]
    for a, b in pairs:
        q = f"Did {a} ever perform in {b} or nearby?"
        items.append(item(q, a, a, "multiple_entities"))
        items.append(item(q, b, b, "multiple_entities"))

    # 10. punctuation adjacency ------------------------------------------
    items.append(item("In Casablanca, which actor played the lead?",
                      "Casablanca", "Casablanca", "punctuation"))
    items.append(item("Was it painted by Frida Kahlo?",
                      "Frida Kahlo", "Frida Kahlo", "punctuation"))
    items.append(item("Who wrote War and Peace; and in which decade?",
                      "War and Peace", "War and Peace", "punctuation"))
    items.append(item("Which city hosted the Super Bowl (in 1990)?",
                      "Super Bowl", "the Super Bowl", "punctuation"))

    # 11. unicode / accents / hyphens ------------------------------------
    items.append(item("How large is São Paulo by area?",
                      "São Paulo", "São Paulo", "unicode"))
    items.append(item("When did Beyoncé release her first album?",
                      "Beyoncé", "Beyoncé", "unicode"))
    items.append(item("Who invented Coca-Cola and where?",
                      "Coca-Cola", "Coca-Cola", "unicode"))
    items.append(item("Which stories did Flannery O'Connor write?",
                      "Flannery O'Connor", "Flannery O'Connor", "unicode"))

    # 12. distractor contexts: common-word titles must NOT fire ----------
    # (gold mention is the real entity; 'It'/'Who'/'Help' appear too)
    items.append(item("Who painted the Mona Lisa and why?",
                      "Mona Lisa", "the Mona Lisa", "distractor_context"))
    items.append(item("It was Elvis Presley who sang it, right?",
                      "Elvis Presley", "Elvis Presley",
                      "distractor_context"))
    items.append(item("Help me recall who founded Microsoft back then?",
                      "Microsoft", "Microsoft", "distractor_context"))

    # 13. appositive with capitalized adjective (documented divergence:
    # a dep parse includes 'Russian'; a gazetteer stops at capitals) ----
    items.append(item("Who wrote the celebrated Russian novel "
                      "War and Peace over six years?",
                      "War and Peace", "the celebrated Russian novel "
                      "War and Peace", "capitalized_adjective"))
    items.append(item("Who built the famous French monument "
                      "Statue of Liberty replica?",
                      "Statue of Liberty", "the famous French monument "
                      "Statue of Liberty", "capitalized_adjective"))

    # 14. entity at the very end, question mark adjacent ------------------
    for e in ["Guernica", "Swan Lake", "Lake Victoria", "England",
              "Hayao Miyazaki", "Ada Lovelace", "Wolfgang Amadeus Mozart",
              "Great Barrier Reef", "São Paulo", "The Lord of the Rings"]:
        items.append(item(f"Which museum currently displays {e}?",
                          e, e, "end_of_question"))

    # 15. more plain coverage across every entity class -------------------
    for e in ["Louis Armstrong", "Wolfgang Amadeus Mozart", "Beyoncé",
              "Hayao Miyazaki", "New York City", "Great Barrier Reef",
              "Casablanca", "Guernica", "Coca-Cola", "Super Bowl"]:
        items.append(item(f"How often is {e} mentioned in textbooks?",
                          e, e, "plain"))

    # 16. determiner phrase at larger distance from the verb --------------
    for det, noun, e in [
        ("the", "reef", "Great Barrier Reef"),
        ("the", "city", "São Paulo"),
        ("his", "masterpiece", "Guernica"),
        ("her", "biography", "Marie Curie"),
        ("their", "album", "The Beatles"),
        ("this", "trilogy", "The Lord of the Rings"),
    ]:
        q = f"Many tourists visit {det} {noun} {e} every year?"
        items.append(item(q, e, f"{det} {noun} {e}", "determiner_phrase"))

    assert len(items) >= 100, len(items)
    names = [it["question"] for it in items]
    assert len(set((it["question"], it["mention"]) for it in items)) == \
        len(items), "duplicate items"
    return {"titles": TITLES, "items": items, "n": len(items),
            "note": "golds follow the reference dep-parse semantics "
                    "(meerqat/data/kilt2vqa.py:157-227)"}


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "ner_adversarial.json")
    with open(out, "w") as f:
        json.dump(build(), f, indent=1, ensure_ascii=False)
        f.write("\n")
    print(f"wrote {out}: {build()['n']} items")
