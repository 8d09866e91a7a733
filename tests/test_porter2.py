"""Porter2 (snowball English) stemmer — vectors derived by hand from the
published algorithm (snowballstem.org/algorithms/english): each case
traces the rule steps (R1/R2 regions, exception lists, step 0-5 suffix
logic). Exact parity with the snowball C implementation cannot be
verified in this container (no snowballstemmer package); these pin the
rule system itself."""

from crawl4ai_custom_spark.kernel.porter2 import porter2_stem


CASES = {
    # exceptions + invariants
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
    "andes": "andes", "proceed": "proceed", "inning": "inning",
    "exceeding": "exceed",
    # step 0/1a
    "caresses": "caress", "ponies": "poni", "ties": "tie", "cats": "cat",
    "caress": "caress", "consensus": "consensus",
    # step 1b incl. short-word e-restore and double-letter undouble
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "running": "run", "hopping": "hop", "hoping": "hope",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    # step 1c
    "happy": "happi",
    # step 2 (R1)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3 (R1/R2)
    "triplicate": "triplic", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    # 'ative' needs R2: here it is NOT in R2, so step 4 'ive' fires instead
    "formative": "format",
    # step 4 (R2)
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "communism", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # gener-/commun-/arsen- R1 prefixes
    "generate": "generat", "generously": "generous",
    # y-as-consonant marking
    "yellow": "yellow", "syzygy": "syzygi",
}


def test_porter2_vectors():
    bad = {w: (porter2_stem(w), want) for w, want in CASES.items()
           if porter2_stem(w) != want}
    assert not bad, bad


def test_porter2_idempotent_on_outputs():
    # stemming a stem must be stable for the corpus above
    for w in CASES.values():
        assert porter2_stem(porter2_stem(w)) == porter2_stem(w)


def test_porter2_short_words_untouched():
    for w in ("a", "is", "be", "ox", "go"):
        assert porter2_stem(w) == w
