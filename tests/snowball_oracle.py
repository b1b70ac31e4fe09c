"""Mini-Snowball interpreter: executes a .sbl algorithm file directly,
used as an ORACLE to diff-fuzz the hand-ported stemmers in
redisearch_tpu/analysis/snowball_ext.py.

The reference vendors exactly one compilable Snowball source in this
checkout (deps/stemmers/algorithms/tagalog.sbl — the deps/snowball
submodule itself is empty), so this interpreter implements the Snowball
runtime semantics (snowballstem.org manual: cursor/limit/bra/ket, among
longest-match without backtracking, `or` with cursor restore, do/test/
not/try, goto/gopast, slice operations with cursor adjustment, backward
mode with distance-from-limit cursor saves) for the construct subset
that file uses.  Running the .sbl text directly means there is no
hand-transcription between the reference's algorithm and the oracle.

This is test-support code, not product code.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>//[^\n]*)
  | (?P<string>'[^']*')
  | (?P<num>\d+)
  | (?P<non>non-)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<sym><-|->|<=|>=|==|!=|[()\[\]$<>=+\-*/{}])
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list:
    # stringescapes declarations change string syntax; the subset we
    # support declares `stringescapes {}` and then never uses escapes.
    text = re.sub(r"stringescapes[^\n]*", "", text)
    toks = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"bad .sbl at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("comment", "ws"):
            continue
        val = m.group()
        if kind == "string":
            toks.append(("str", val[1:-1]))
        elif kind == "num":
            toks.append(("num", int(val)))
        elif kind == "non":
            toks.append(("non", "non-"))
        elif kind == "name":
            toks.append(("name", val))
        else:
            toks.append(("sym", val))
    return toks


# ---------------------------------------------------------------------------
# Parser — produces tuple-based AST nodes
# ---------------------------------------------------------------------------

_DECL_KINDS = ("strings", "integers", "booleans", "routines",
               "externals", "groupings")


class Among:
    """Holder for among(...) word/action tables (mutable so Substring
    nodes can reference it before actions are fully parsed)."""

    def __init__(self):
        self.words = []      # list of (string, action_index)
        self.actions = []    # list of AST or None


class Program:
    def __init__(self):
        self.kinds = {}      # name -> decl kind
        self.routines = {}   # name -> AST
        self.groupings = {}  # name -> set of chars


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0
        self.prog = Program()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise SyntaxError(f"expected {kind} {val}, got {t}")
        return t

    # -- top level ----------------------------------------------------
    def parse(self):
        while self.peek()[0] != "eof":
            self.decl()
        return self.prog

    def decl(self):
        k, v = self.next()
        if k == "name" and v in _DECL_KINDS:
            self.expect("sym", "(")
            while self.peek() != ("sym", ")"):
                nk, nv = self.next()
                assert nk == "name"
                self.prog.kinds[nv] = v
            self.next()
        elif k == "name" and v == "define":
            _, name = self.expect("name")
            if self.peek() == ("name", "as"):
                self.next()
                body = self.parse_expr_unit()
                self.prog.routines[name] = self._link(body)
            else:
                # grouping definition: one string literal (subset)
                sk, sv = self.next()
                assert sk == "str"
                self.prog.groupings[name] = set(sv)
        elif k == "name" and v == "backwardmode":
            # mode is dynamic at runtime (backwards(...)); just parse the
            # contained defines
            self.expect("sym", "(")
            while self.peek() != ("sym", ")"):
                self.decl()
            self.next()
        else:
            raise SyntaxError(f"unexpected top-level token {(k, v)}")

    # -- commands -----------------------------------------------------
    def parse_expr_unit(self):
        """A single command unit (possibly parenthesized expr)."""
        return self.parse_unary()

    def parse_expr(self):
        left = self.parse_seq()
        while self.peek() in (("name", "or"), ("name", "and")):
            _, op = self.next()
            right = self.parse_seq()
            left = (op, left, right)
        return left

    _SEQ_STOP = {("sym", ")"), ("name", "or"), ("name", "and"),
                 ("eof", "")}

    def parse_seq(self):
        items = [self.parse_unary()]
        while self.peek() not in self._SEQ_STOP:
            items.append(self.parse_unary())
        return ("seq", items) if len(items) > 1 else items[0]

    def parse_unary(self):
        k, v = self.next()
        if (k, v) == ("sym", "("):
            e = self.parse_expr()
            self.expect("sym", ")")
            return e
        if k == "sym" and v == "[":
            return ("bra",)
        if k == "sym" and v == "]":
            return ("ket",)
        if k == "sym" and v == "<-":
            sk, sv = self.next()
            assert sk == "str"
            return ("slice_from", sv)
        if k == "sym" and v == "->":
            _, name = self.expect("name")
            return ("slice_to", name)
        if k == "sym" and v == "$":
            self.expect("sym", "(")
            lhs = self.parse_ae()
            _, op = self.next()
            rhs = self.parse_ae()
            self.expect("sym", ")")
            return ("cond", lhs, op, rhs)
        if k == "str":
            return ("lit", v)
        if k == "non":
            _, name = self.expect("name")
            return ("grouping", name, True)
        if k == "name":
            if v in ("not", "test", "do", "try", "goto", "gopast",
                     "backwards", "repeat"):
                return (v, self.parse_unary())
            if v == "among":
                return self.parse_among()
            if v == "substring":
                return ("substring", [None])  # linked later (mutable cell)
            if v in ("delete", "atlimit", "next", "tolimit", "atmark"):
                return (v,)
            if v == "hop":
                nk, nv = self.next()
                assert nk == "num"
                return ("hop", nv)
            if v in ("set", "unset", "setmark", "tomark"):
                _, name = self.expect("name")
                return (v, name)
            return ("ref", v)   # routine / grouping / boolean / string var
        raise SyntaxError(f"unexpected token {(k, v)}")

    def parse_ae(self):
        node = self.parse_ae_atom()
        while self.peek() in (("sym", "+"), ("sym", "-")):
            _, op = self.next()
            node = ("ae" + op, node, self.parse_ae_atom())
        return node

    def parse_ae_atom(self):
        k, v = self.next()
        if k == "num":
            return ("aenum", v)
        assert k == "name"
        return ("aename", v)

    def parse_among(self):
        self.expect("sym", "(")
        am = Among()
        pending = []          # word indices awaiting an action
        while self.peek() != ("sym", ")"):
            k, v = self.peek()
            if k == "str":
                self.next()
                am.words.append([v, None])
                pending.append(len(am.words) - 1)
            elif (k, v) == ("sym", "("):
                self.next()
                act = self.parse_expr()
                self.expect("sym", ")")
                am.actions.append(act)
                for wi in pending:
                    am.words[wi][1] = len(am.actions) - 1
                pending = []
            else:
                raise SyntaxError(f"bad among item {(k, v)}")
        self.next()
        return ("among", am)

    # -- substring linking ---------------------------------------------
    def _link(self, node):
        """Link each `substring` to the next `among` in its seq."""
        if not isinstance(node, tuple):
            return node
        if node[0] == "seq":
            items = node[1]
            for idx, it in enumerate(items):
                items[idx] = self._link(it)
            for idx, it in enumerate(items):
                if isinstance(it, tuple) and it[0] == "substring":
                    for it2 in items[idx + 1:]:
                        if isinstance(it2, tuple) and it2[0] == "among":
                            it[1][0] = it2[1]
                            break
            return node
        return tuple(self._link(x) if isinstance(x, (tuple, list)) else x
                     for x in node)


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------

class SnowballMachine:
    def __init__(self, sbl_text: str):
        self.prog = _Parser(tokenize(sbl_text)).parse()

    # environment is per-call (stemming is single threaded here)
    def stem(self, word: str) -> str:
        self.s = word
        self.c = 0
        self.lb = 0
        self.mode = "f"
        self.bra = 0
        self.ket = 0
        self.bools = {n: False for n, k in self.prog.kinds.items()
                      if k == "booleans"}
        self.strs = {n: "" for n, k in self.prog.kinds.items()
                     if k == "strings"}
        self.ints = {n: 0 for n, k in self.prog.kinds.items()
                     if k == "integers"}
        self.among_hit = {}
        self.eval(self.prog.routines["stem"])
        return self.s

    # -- cursor save/restore (backward mode saves distance-from-limit,
    # matching the generated-C convention so slice ops compose) --------
    @property
    def l(self):
        return len(self.s)

    def save(self):
        return self.c if self.mode == "f" else self.l - self.c

    def restore(self, m):
        self.c = m if self.mode == "f" else self.l - m

    def _slice(self, repl: str):
        b, k = self.bra, self.ket
        assert 0 <= b <= k <= self.l, (b, k, self.s)
        self.s = self.s[:b] + repl + self.s[k:]
        adj = len(repl) - (k - b)
        if self.c >= k:
            self.c += adj
        elif self.c > b:
            self.c = b
        if self.lb >= k:
            self.lb += adj
        elif self.lb > b:
            self.lb = b
        self.ket = b + len(repl)

    # -- main eval ------------------------------------------------------
    def eval(self, node) -> bool:  # noqa: C901
        op = node[0]
        if op == "seq":
            for it in node[1]:
                if not self.eval(it):
                    return False
            return True
        if op == "or":
            m = self.save()
            if self.eval(node[1]):
                return True
            self.restore(m)
            return self.eval(node[2])
        if op == "and":
            m = self.save()
            if not self.eval(node[1]):
                return False
            self.restore(m)
            return self.eval(node[2])
        if op == "not":
            m = self.save()
            r = self.eval(node[1])
            self.restore(m)
            return not r
        if op == "test":
            m = self.save()
            r = self.eval(node[1])
            self.restore(m)
            return r
        if op == "try":
            m = self.save()
            if not self.eval(node[1]):
                self.restore(m)
            return True
        if op == "do":
            m = self.save()
            self.eval(node[1])
            self.restore(m)
            return True
        if op == "repeat":
            while True:
                m = self.save()
                if not self.eval(node[1]):
                    self.restore(m)
                    return True
        if op in ("goto", "gopast"):
            while True:
                m = self.save()
                if self.eval(node[1]):
                    if op == "goto":
                        self.restore(m)
                    return True
                self.restore(m)
                if self.mode == "f":
                    if self.c >= self.l:
                        return False
                    self.c += 1
                else:
                    if self.c <= self.lb:
                        return False
                    self.c -= 1
        if op == "backwards":
            old_lb, old_c = self.lb, self.c
            self.lb, self.c, self.mode = self.c, self.l, "b"
            self.eval(node[1])
            self.c, self.lb, self.mode = self.lb, old_lb, "f"
            return True
        if op == "lit":
            return self._lit(node[1])
        if op == "grouping":
            return self._grp(self.prog.groupings[node[1]], node[2])
        if op == "bra":
            if self.mode == "f":
                self.bra = self.c
            else:
                self.ket = self.c
            return True
        if op == "ket":
            if self.mode == "f":
                self.ket = self.c
            else:
                self.bra = self.c
            return True
        if op == "delete":
            self._slice("")
            return True
        if op == "slice_from":
            self._slice(node[1])
            return True
        if op == "slice_to":
            self.strs[node[1]] = self.s[self.bra:self.ket]
            return True
        if op == "atlimit":
            return self.c == (self.l if self.mode == "f" else self.lb)
        if op == "tolimit":
            self.c = self.l if self.mode == "f" else self.lb
            return True
        if op == "next":
            return self._hop(1)
        if op == "hop":
            return self._hop(node[1])
        if op == "set":
            self.bools[node[1]] = True
            return True
        if op == "unset":
            self.bools[node[1]] = False
            return True
        if op == "setmark":
            self.ints[node[1]] = self.c
            return True
        if op == "tomark":
            x = self.ints[node[1]]
            if self.mode == "f":
                if self.c > x:
                    return False
                self.c = x
            else:
                if self.c < x:
                    return False
                self.c = x
            return True
        if op == "cond":
            a, b = self._ae(node[1]), self._ae(node[3])
            return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b,
                    "==": a == b, "!=": a != b, "=": a == b}[node[2]]
        if op == "substring":
            return self._substring(node[1][0])
        if op == "among":
            am = node[1]
            idx = self.among_hit.pop(id(am), None)
            if idx is None:
                if not self._substring(am):
                    return False
                idx = self.among_hit.pop(id(am))
            act = am.words[idx][1]
            if act is None:
                return True
            return self.eval(am.actions[act])
        if op == "ref":
            name = node[1]
            kind = self.prog.kinds.get(name)
            if name in self.prog.routines:
                return self.eval(self.prog.routines[name])
            if name in self.prog.groupings:
                return self._grp(self.prog.groupings[name], False)
            if kind == "booleans":
                return self.bools[name]
            if kind == "strings":
                return self._lit(self.strs[name])
            raise NameError(f"unresolved name {name}")
        raise NotImplementedError(op)

    # -- primitives -----------------------------------------------------
    def _lit(self, t: str) -> bool:
        if self.mode == "f":
            if self.c + len(t) <= self.l and \
                    self.s.startswith(t, self.c):
                self.c += len(t)
                return True
            return False
        if self.c - len(t) >= self.lb and \
                self.s[self.c - len(t):self.c] == t:
            self.c -= len(t)
            return True
        return False

    def _grp(self, chars, negate: bool) -> bool:
        if self.mode == "f":
            if self.c >= self.l:
                return False
            ok = (self.s[self.c] in chars) != negate
            if ok:
                self.c += 1
            return ok
        if self.c <= self.lb:
            return False
        ok = (self.s[self.c - 1] in chars) != negate
        if ok:
            self.c -= 1
        return ok

    def _hop(self, n: int) -> bool:
        if self.mode == "f":
            if self.c + n > self.l:
                return False
            self.c += n
        else:
            if self.c - n < self.lb:
                return False
            self.c -= n
        return True

    def _ae(self, node) -> int:
        if node[0] == "aenum":
            return node[1]
        if node[0] == "ae+":
            return self._ae(node[1]) + self._ae(node[2])
        if node[0] == "ae-":
            return self._ae(node[1]) - self._ae(node[2])
        name = node[1]
        if name == "cursor":
            return self.c
        if name == "limit":
            return self.l if self.mode == "f" else self.lb
        if name in ("len", "size"):
            return self.l
        return self.ints[name]

    def _substring(self, am: Among) -> bool:
        best, besti = -1, None
        for i, (w, _act) in enumerate(am.words):
            n = len(w)
            if n <= best:
                continue
            if self.mode == "f":
                if self.c + n <= self.l and self.s.startswith(w, self.c):
                    best, besti = n, i
            else:
                if self.c - n >= self.lb and \
                        self.s[self.c - n:self.c] == w:
                    best, besti = n, i
        if besti is None:
            return False
        if self.mode == "f":
            self.c += best
        else:
            self.c -= best
        self.among_hit[id(am)] = besti
        return True
