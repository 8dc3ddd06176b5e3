from cdrc_semantic_search_spark.operators.extraction_core import (
    AliasMatcher,
    extract_turn,
)

CAT = [
    ("E1", ["Index of Multiple Deprivation", "IMD", "index of multiple deprivation"]),
    ("E2", ["Leeds Retail Area", "LRA"]),
    ("E3", ["Census Dataset"]),
    ("E4", ["Sql Helper Tool"]),
]


def matcher():
    return AliasMatcher(CAT)


def test_exact_alias_match_longest_wins():
    m = matcher()
    ms = m.find("The Index of Multiple Deprivation is useful.")
    assert len(ms) == 1
    assert ms[0].surface == "Index of Multiple Deprivation"
    assert ms[0].exact


def test_case_insensitive_and_initials():
    ms = matcher().find("compare imd with LRA today")
    assert [x.surface for x in ms] == ["imd", "LRA"]


def test_no_partial_word_match():
    # "IMD" must not match inside "IMDb"
    ms = matcher().find("look at IMDb reviews")
    assert ms == []


def test_relation_extraction_basic():
    _, rels = extract_turn("Note that IMD relates to Census Dataset.", matcher())
    assert len(rels) == 1
    pred, subj, obj = rels[0]
    assert pred == "relates_to"
    assert subj.surface == "IMD"
    assert obj.surface == "Census Dataset"


def test_relation_located_in_beats_bare_in():
    _, rels = extract_turn("Census Dataset is located in Leeds Retail Area.", matcher())
    assert rels[0][0] == "located_in"


def test_fallback_span_for_unknown_surface():
    # "Cenus Dataset" (typo) is not an alias — fallback span must catch it
    _, rels = extract_turn("I found that Cenus Dataset relates to IMD.", matcher())
    assert len(rels) == 1
    pred, subj, obj = rels[0]
    assert subj.surface == "Cenus Dataset"
    assert not subj.exact
    assert obj.exact


def test_relation_confined_to_sentence():
    text = "IMD is great. It relates to nothing here. Census Dataset too."
    _, rels = extract_turn(text, matcher())
    # subj fallback span "It" is too short; no cross-sentence reach to IMD
    for pred, subj, obj in rels:
        assert subj.surface != "IMD"


def test_alias_to_entity_tiebreak_smallest_id():
    m = AliasMatcher([("E9", ["Foo"]), ("E2", ["Foo"])])
    assert m.alias_to_entity["foo"] == "E2"
