"""Query parser — the set-op algebra subset of oscar's AdvancedCellOpTree.

Grammar (pinned; shared verbatim by oracle and Spark executor):
    ops (binary, equal precedence, left-associative — matching the
    reference's as-parsed execution order, no reordering; see
    reference/oscar-cmd/DecelledACOT.cpp:73-98):
        ' ' or '/'  intersection (default op between adjacent operands)
        '+'         union
        '-'         difference
        '^'         symmetric difference
    '(' ')'   grouping (unbalanced input tolerated: EOF closes, stray ')'
              ends the innermost group)
    '"..."'   quoted multi-token → PHRASE node (tokens adjacent in the
              indexed stream — QT_EXACT analog; a single quoted token is
              a plain term).  Engines without positional payloads
              degrade a phrase to the intersection of its tokens.
    '\\'      escapes the next character into the current word (the
              reference escape set is `-+/\\^$[]() `,
              reference/oscar-cmd/CompletionStringCreators.cpp:6-15)
    'key:val' fielded composite leaf (@key:value analog,
              reference/oscar-create/TextSearchTraits.h:108).  When the
              caller provides the store's indexed-field keys
              (parse(field_keys=...), as SearchEngine and OracleIndex
              do), only colon words whose normalized key IS an indexed
              field take this path; any other colon word ('16:30', URL
              fragments) parses as the intersection of its tokens.
              Bare parse() calls without field_keys keep every
              well-formed colon word fielded.

Robustness contract (FIXTURES.md §3.2, analog of
reference/data/tests/oscar-cmd/dont_crash_test.txt): parse() NEVER raises;
degenerate input yields EMPTY.  An operator with a missing left operand
gets EMPTY as its left side (EMPTY∩x=∅, EMPTY∪x=x, EMPTY−x=∅, EMPTY⊕x=x).

AST nodes (plain tuples, consumable by both evaluators):
    ("term", token)              ("empty",)
    ("phrase", (tok1, tok2, ...))
    ("and"|"or"|"not"|"xor", left, right)
"""

from __future__ import annotations

from oscar_spark.functions.tokenize import tokenize

EMPTY = ("empty",)

_OPS = {"+": "or", "-": "not", "^": "xor", "/": "and"}


def _lex(query: str):
    """→ list of ('op',kind) | ('lparen',) | ('rparen',) | ('word',text)."""
    out = []
    i, n = 0, len(query)
    word: list[str] = []

    def flush():
        if word:
            out.append(("word", "".join(word)))
            word.clear()

    while i < n:
        c = query[i]
        if c == "\\" and i + 1 < n:
            word.append(query[i + 1])
            i += 2
            continue
        if c == '"':
            flush()
            j = query.find('"', i + 1)
            if j == -1:  # unterminated quote: swallow to end
                out.append(("quoted", query[i + 1:]))
                i = n
            else:
                out.append(("quoted", query[i + 1:j]))
                i = j + 1
            continue
        if c in _OPS and not (c == "-" and word):
            # '-' inside a word (hyphen) stays in the word; the tokenizer
            # splits it later, yielding an intersection of the parts.
            flush()
            out.append(("op", _OPS[c]))
            i += 1
            continue
        if c == "(":
            flush()
            out.append(("lparen",))
            i += 1
            continue
        if c == ")":
            flush()
            out.append(("rparen",))
            i += 1
            continue
        if c.isspace():
            flush()
            i += 1
            continue
        word.append(c)
        i += 1
    flush()
    return out


def _terms_node(text: str, allow_prefix: bool = True, field_keys=None):
    """Text fragment → intersection of its normalized tokens (or EMPTY).

    A trailing '*' marks a prefix query (QT_PREFIX analog: the trie
    subtree merge of reference/oscar-create/CellTextCompleter.h:496-525
    becomes a range scan of the sorted term table).  A leading '*' marks
    suffix ('*tok', QT_SUFFIX) and both ends substring ('*tok*',
    QT_SUBSTRING) — expanded against the term dictionary, the analog of
    oscar's suffix-string enumeration at build time
    (reference/oscar-create/CellTextCompleter.h:602-637).  Stars in
    other positions are treated as token separators.
    """
    # fielded composite leaf (`lang:en` or `@lang:en`,
    # reference/oscar-create/TextSearchTraits.h:108): both halves
    # normalize under the pinned field rule and become ONE dictionary
    # term containing ':' — which the text tokenizer can never emit,
    # so fielded and text terms cannot collide.  field_keys (a set of
    # NORMALIZED keys, from the store manifest) narrows the rule: a
    # colon word whose key is not an indexed field ('16:30', URL
    # fragments) falls through to the intersection of its tokens
    # instead of silently matching nothing.  field_keys=None (store
    # unknown, e.g. bare parse() calls) keeps every colon word fielded.
    if ":" in text and "*" not in text:
        from oscar_spark.functions.tokenize import normalize_field_value
        k, _, v = text.partition(":")
        kn = normalize_field_value(k.lstrip("@"))
        vn = normalize_field_value(v)
        if kn and vn and (field_keys is None or kn in field_keys):
            return ("term", f"{kn}:{vn}")
    trail = allow_prefix and text.endswith("*") and len(text) > 1
    lead = allow_prefix and text.startswith("*") and len(text) > 1
    toks = tokenize(text)
    node = None
    for i, tok in enumerate(toks):
        if lead and trail and len(toks) == 1:
            leaf = ("substr", tok)
        elif trail and i == len(toks) - 1:
            leaf = ("prefix", tok)
        elif lead and i == 0:
            leaf = ("suffix", tok)
        else:
            leaf = ("term", tok)
        node = leaf if node is None else ("and", node, leaf)
    return node if node is not None else EMPTY


def _parse_tokens(toks, pos: int, depth: int, field_keys=None):
    node = None
    pending: str | None = None

    def attach(operand):
        nonlocal node, pending
        if node is None:
            node = operand if pending is None else (pending, EMPTY, operand)
        else:
            node = (pending or "and", node, operand)
        pending = None

    while pos < len(toks):
        t = toks[pos]
        kind = t[0]
        if kind == "word" or kind == "quoted":
            if kind == "quoted":
                # NOTE: local name must not shadow the token stream
                # (`toks`) — rebinding it silently dropped every query
                # token after a quoted string
                qtoks = tokenize(t[1])
                # multi-token quote = phrase; single token = plain term
                sub = (("phrase", tuple(qtoks)) if len(qtoks) > 1
                       else ("term", qtoks[0]) if qtoks else EMPTY)
            else:
                sub = _terms_node(t[1], allow_prefix=True,
                                  field_keys=field_keys)
            if sub != EMPTY:
                attach(sub)
            pos += 1
        elif kind == "op":
            pending = t[1]
            pos += 1
        elif kind == "lparen":
            sub, pos = _parse_tokens(toks, pos + 1, depth + 1, field_keys)
            if sub != EMPTY:
                attach(sub)
        else:  # rparen
            pos += 1
            if depth > 0:
                break
            # stray ')' at top level: ignore
    return (node if node is not None else EMPTY), pos


def parse(query: str, field_keys=None):
    """Query string → AST.  Never raises.

    field_keys: optional set of NORMALIZED indexed-field keys (store
    manifest) — colon words with other keys parse as the intersection
    of their tokens rather than a fielded leaf (see _terms_node)."""
    try:
        node, _ = _parse_tokens(_lex(query), 0, 0, field_keys)
        return node
    except RecursionError:
        return EMPTY


def query_terms(node, expand_prefix=None, expand_wild=None) -> list[str]:
    """Distinct terms of an AST in first-appearance order (scoring set).

    Prefix leaves contribute their expansion: `expand_prefix(stem)` must
    return the matching terms (both engines pin the same rule: all index
    terms starting with the stem, sorted, capped at MAX_PREFIX_EXPAND).
    Suffix/substring leaves expand via `expand_wild(kind, stem)` under
    the same pinned rule (endswith/contains, sorted, capped).  Without
    an expander, those leaves contribute nothing.
    """
    out: list[str] = []
    seen = set()

    def add(t):
        if t not in seen:
            seen.add(t)
            out.append(t)

    def walk(n):
        if n[0] == "term":
            add(n[1])
        elif n[0] == "phrase":
            for t in n[1]:
                add(t)
        elif n[0] == "prefix":
            if expand_prefix is not None:
                for t in expand_prefix(n[1]):
                    add(t)
        elif n[0] in ("suffix", "substr"):
            if expand_wild is not None:
                for t in expand_wild(n[0], n[1]):
                    add(t)
        elif n[0] != "empty":
            walk(n[1])
            walk(n[2])

    walk(node)
    return out
