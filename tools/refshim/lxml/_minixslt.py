"""Tiny XSLT 1.0 interpreter for exactly the subset the ru_address schema
templates use (mysql/postgres/clickhouse .schema.xsl + .index.xsl):

  instructions: template (match="/" + named), param, with-param,
                call-template, for-each, if, choose/when/otherwise,
                value-of, text, output (ignored)
  XPath:        relative/absolute child paths, @attr steps, '.', '//',
                '*' wildcard, positional + equality predicates,
                $variables, string/number literals, 'or'/'and',
                = != < > <= >= comparisons (XPath 1.0 node-set semantics),
                position() last() current() name() normalize-space()
                contains() substring-before()

Implemented from the public XSLT 1.0 / XPath 1.0 specs; no lxml/libxslt code
involved. Only needed so the UNMODIFIED reference CLI's `schema` subcommand
can run in this offline sandbox and produce byte-parity goldens.
"""
import re
import xml.etree.ElementTree as _ET

XSL = "{http://www.w3.org/1999/XSL/Transform}"


class AttrNode:
    __slots__ = ("name", "value")

    def __init__(self, name, value):
        self.name = name
        self.value = value


class DocNode:
    """XPath root (document) node wrapping the root element."""
    __slots__ = ("root",)

    def __init__(self, root):
        self.root = root


def _string_value(node):
    if isinstance(node, AttrNode):
        return node.value
    if isinstance(node, DocNode):
        return "".join(node.root.itertext())
    return "".join(node.itertext())


def _to_string(v):
    if isinstance(v, list):  # node-set
        return _string_value(v[0]) if v else ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v):
            return str(int(v))
        return repr(v)
    return str(v)


def _to_number(v):
    try:
        return float(_to_string(v).strip())
    except ValueError:
        return float("nan")


def _to_bool(v):
    if isinstance(v, list):
        return len(v) > 0
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    return len(str(v)) > 0


def _children(node):
    if isinstance(node, DocNode):
        return [node.root]
    if isinstance(node, AttrNode):
        return []
    return list(node)


def _descendant_or_self(node):
    out = [node]
    for c in _children(node):
        out.extend(_descendant_or_self(c))
    return out


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<lit>'[^']*'|"[^"]*")
      | (?P<var>\$[\w.-]+)
      | (?P<dslash>//)
      | (?P<op>!=|<=|>=|[=<>\[\]()@*,/])
      | (?P<name>[\w][\w.-]*(?::[\w][\w.-]*)?)
      | (?P<dot>\.\.?)
    )""",
    re.VERBOSE,
)


def _tokenize(expr):
    toks, pos = [], 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip() == "":
                break
            raise ValueError(f"bad XPath at {expr[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))
    return toks


class _Parser:
    """Recursive-descent parser for the XPath subset -> AST tuples."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.take()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    def parse(self):
        e = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens {self.toks[self.i:]}")
        return e

    def or_expr(self):
        left = self.and_expr()
        while self.peek() == ("name", "or"):
            self.take()
            left = ("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.cmp_expr()
        while self.peek() == ("name", "and"):
            self.take()
            left = ("and", left, self.cmp_expr())
        return left

    def cmp_expr(self):
        left = self.primary()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<", ">", "<=", ">="):
            self.take()
            return ("cmp", v, left, self.primary())
        return left

    def primary(self):
        k, v = self.peek()
        if k == "num":
            self.take()
            return ("num", float(v))
        if k == "lit":
            self.take()
            return ("lit", v[1:-1])
        if k == "var":
            self.take()
            return ("var", v[1:])
        if k == "op" and v == "(":
            self.take()
            e = self.or_expr()
            self.expect(")")
            return e
        # function call?
        if k == "name" and self.peek(1) == ("op", "("):
            name = self.take()[1]
            self.take()  # (
            args = []
            if self.peek() != ("op", ")"):
                args.append(self.or_expr())
                while self.peek() == ("op", ","):
                    self.take()
                    args.append(self.or_expr())
            self.expect(")")
            node = ("call", name, args)
            # a function call can start a path: name(current()) has none,
            # but current()/... would; support trailing steps
            if self.peek()[1] in ("/", "//"):
                return self.path(node)
            return node
        return self.path(None)

    def path(self, start):
        """Location path; `start` is an AST whose node-set seeds the walk
        (None = context node, or absolute if leading '/')."""
        steps = []
        absolute = False
        if start is None:
            k, v = self.peek()
            if k == "dslash":
                absolute = True
                self.take()
                steps.append(("desc",))
            elif k == "op" and v == "/":
                absolute = True
                self.take()
        first = True
        while True:
            k, v = self.peek()
            if k == "dot":
                self.take()
                steps.append(("self",) if v == "." else ("parent",))
            elif k == "op" and v == "@":
                self.take()
                nk, nv = self.take()
                if not (nk == "name" or nv == "*"):
                    raise ValueError("bad attribute step")
                steps.append(("attr", nv))
            elif k == "name" or (k == "op" and v == "*"):
                self.take()
                preds = []
                while self.peek() == ("op", "["):
                    self.take()
                    preds.append(self.or_expr())
                    self.expect("]")
                steps.append(("child", v, preds))
            else:
                if first and not absolute:
                    raise ValueError(f"empty path at {self.toks[self.i:]}")
                break
            first = False
            k, v = self.peek()
            if k == "dslash":
                self.take()
                steps.append(("desc",))
            elif k == "op" and v == "/":
                self.take()
            else:
                break
        return ("path", start, absolute, steps)


_AST_CACHE = {}


def _ast(expr):
    a = _AST_CACHE.get(expr)
    if a is None:
        a = _Parser(_tokenize(expr)).parse()
        _AST_CACHE[expr] = a
    return a


class Context:
    __slots__ = ("node", "pos", "size", "vars", "current", "doc", "nsmap")

    def __init__(self, node, pos, size, vars_, current, doc, nsmap):
        self.node = node
        self.pos = pos
        self.size = size
        self.vars = vars_
        self.current = current
        self.doc = doc
        self.nsmap = nsmap


def _qname(name, nsmap):
    if ":" in name:
        prefix, local = name.split(":", 1)
        uri = nsmap.get(prefix)
        if uri is None:
            raise ValueError(f"unbound prefix {prefix}")
        return "{%s}%s" % (uri, local)
    return name


def _eval(ast, ctx):
    kind = ast[0]
    if kind == "num":
        return ast[1]
    if kind == "lit":
        return ast[1]
    if kind == "var":
        return ctx.vars.get(ast[1], "")
    if kind == "or":
        return _to_bool(_eval(ast[1], ctx)) or _to_bool(_eval(ast[2], ctx))
    if kind == "and":
        return _to_bool(_eval(ast[1], ctx)) and _to_bool(_eval(ast[2], ctx))
    if kind == "cmp":
        return _compare(ast[1], _eval(ast[2], ctx), _eval(ast[3], ctx))
    if kind == "call":
        return _call(ast[1], ast[2], ctx)
    if kind == "path":
        return _eval_path(ast, ctx)
    raise ValueError(f"unknown AST {ast!r}")


def _compare(op, a, b):
    # XPath 1.0: node-set comparisons are existential
    if isinstance(a, list) or isinstance(b, list):
        aset = a if isinstance(a, list) else None
        bset = b if isinstance(b, list) else None
        if aset is not None and bset is not None:
            return any(
                _compare(op, _string_value(x), _string_value(y))
                for x in aset
                for y in bset
            )
        if aset is not None:
            return any(_compare(op, _string_value(x), b) for x in aset)
        return any(_compare(op, a, _string_value(y)) for y in bset)
    if op in ("<", ">", "<=", ">="):
        x, y = _to_number(a), _to_number(b)
        return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
    if isinstance(a, bool) or isinstance(b, bool):
        eq = _to_bool(a) == _to_bool(b)
    elif isinstance(a, float) or isinstance(b, float):
        eq = _to_number(a) == _to_number(b)
    else:
        eq = _to_string(a) == _to_string(b)
    return eq if op == "=" else not eq


def _call(name, args, ctx):
    if name == "position":
        return float(ctx.pos)
    if name == "last":
        return float(ctx.size)
    if name == "current":
        return [ctx.current]
    if name == "name":
        nodes = _eval(args[0], ctx) if args else [ctx.node]
        if not nodes:
            return ""
        n = nodes[0]
        if isinstance(n, AttrNode):
            return n.name
        tag = n.root.tag if isinstance(n, DocNode) else n.tag
        if tag.startswith("{"):
            uri, local = tag[1:].split("}", 1)
            for p, u in ctx.nsmap.items():
                if u == uri and p:
                    return f"{p}:{local}"
            return local
        return tag
    if name == "normalize-space":
        s = _to_string(_eval(args[0], ctx)) if args else _string_value(ctx.node)
        return " ".join(s.split())
    if name == "contains":
        return _to_string(_eval(args[0], ctx)).find(
            _to_string(_eval(args[1], ctx))) >= 0
    if name == "substring-before":
        s = _to_string(_eval(args[0], ctx))
        sub = _to_string(_eval(args[1], ctx))
        i = s.find(sub)
        return s[:i] if i >= 0 else ""
    if name == "string":
        return _to_string(_eval(args[0], ctx)) if args else _string_value(ctx.node)
    if name == "not":
        return not _to_bool(_eval(args[0], ctx))
    if name == "true":
        return True
    if name == "false":
        return False
    if name == "concat":
        return "".join(_to_string(_eval(a, ctx)) for a in args)
    raise ValueError(f"unsupported XPath function {name}()")


def _eval_path(ast, ctx):
    _, start, absolute, steps = ast
    if start is not None:
        seed = _eval(start, ctx)
        if not isinstance(seed, list):
            raise ValueError("path start must be a node-set")
        nodes = list(seed)
    elif absolute:
        nodes = [ctx.doc]
    else:
        nodes = [ctx.node]
    for step in steps:
        op = step[0]
        if op == "self":
            continue
        if op == "desc":
            acc = []
            for n in nodes:
                for d in _descendant_or_self(n):
                    if d not in acc:
                        acc.append(d)
            nodes = acc
            continue
        if op == "attr":
            acc = []
            for n in nodes:
                if isinstance(n, (DocNode, AttrNode)):
                    continue
                if step[1] == "*":
                    acc.extend(AttrNode(k, v) for k, v in n.attrib.items())
                elif step[1] in n.attrib:
                    acc.append(AttrNode(step[1], n.attrib[step[1]]))
            nodes = acc
            continue
        if op == "child":
            name, preds = step[1], step[2]
            tag = None if name == "*" else _qname(name, ctx.nsmap)
            acc = []
            for n in nodes:
                group = [c for c in _children(n)
                         if (tag is None and isinstance(c.tag, str)) or c.tag == tag]
                for pred in preds:
                    kept = []
                    size = len(group)
                    for i, c in enumerate(group):
                        pc = Context(c, i + 1, size, ctx.vars, ctx.current,
                                     ctx.doc, ctx.nsmap)
                        r = _eval(pred, pc)
                        ok = (i + 1 == r) if isinstance(r, float) else _to_bool(r)
                        if ok:
                            kept.append(c)
                    group = kept
                for c in group:
                    if c not in acc:
                        acc.append(c)
            nodes = acc
            continue
        raise ValueError(f"unsupported step {step!r}")
    return nodes


class XSLTResult:
    def __init__(self, text):
        self._text = text

    def __str__(self):
        return self._text


class MiniXSLT:
    """Compiled stylesheet; call with a document tree + string params."""

    def __init__(self, stylesheet):
        root = stylesheet.getroot() if hasattr(stylesheet, "getroot") else stylesheet
        self.nsmap = dict(getattr(stylesheet, "_shim_nsmap", None)
                          or {"xs": "http://www.w3.org/2001/XMLSchema"})
        self.nsmap.pop("xsl", None)
        self.root_template = None
        self.named = {}
        self.globals = {}
        for child in root:
            if child.tag == XSL + "template":
                if child.get("match") is not None:
                    if child.get("match") != "/":
                        raise ValueError("only match='/' templates supported")
                    self.root_template = child
                if child.get("name"):
                    self.named[child.get("name")] = child
            elif child.tag == XSL + "param":
                self.globals[child.get("name")] = ""
        if self.root_template is None:
            raise ValueError("stylesheet has no match='/' template")

    def __call__(self, doc, **params):
        doc_node = DocNode(doc.getroot() if hasattr(doc, "getroot") else doc)
        vars_ = dict(self.globals)
        for k, v in params.items():
            if k in self.globals:
                vars_[k] = "" if v is None else str(v)
        out = []
        ctx = Context(doc_node, 1, 1, vars_, doc_node, doc_node, self.nsmap)
        self._apply(self.root_template, ctx, out)
        return XSLTResult("".join(out))

    # ------------------------------------------------------------ sequencing

    def _emit_text(self, text, parent_is_text, out):
        if text is None:
            return
        if parent_is_text or text.strip():
            out.append(text)

    def _apply(self, tmpl, ctx, out):
        """Run a template body: text/instructions in document order."""
        is_text = tmpl.tag == XSL + "text"
        self._emit_text(tmpl.text, is_text, out)
        for child in tmpl:
            self._instruction(child, ctx, out)
            self._emit_text(child.tail, False, out)

    def _instruction(self, el, ctx, out):
        tag = el.tag
        if tag == XSL + "text":
            out.append(el.text or "")
        elif tag == XSL + "value-of":
            out.append(_to_string(_eval(_ast(el.get("select")), ctx)))
        elif tag == XSL + "if":
            if _to_bool(_eval(_ast(el.get("test")), ctx)):
                self._apply(el, ctx, out)
        elif tag == XSL + "choose":
            for branch in el:
                if branch.tag == XSL + "when":
                    if _to_bool(_eval(_ast(branch.get("test")), ctx)):
                        self._apply(branch, ctx, out)
                        return
                elif branch.tag == XSL + "otherwise":
                    self._apply(branch, ctx, out)
                    return
        elif tag == XSL + "for-each":
            nodes = _eval(_ast(el.get("select")), ctx)
            if not isinstance(nodes, list):
                raise ValueError("for-each select must be a node-set")
            size = len(nodes)
            for i, n in enumerate(nodes):
                sub = Context(n, i + 1, size, ctx.vars, n, ctx.doc, ctx.nsmap)
                self._apply(el, sub, out)
        elif tag == XSL + "call-template":
            tmpl = self.named[el.get("name")]
            passed = {}
            for wp in el:
                if wp.tag == XSL + "with-param":
                    passed[wp.get("name")] = _eval(_ast(wp.get("select")), ctx)
            vars_ = dict(ctx.vars)
            for p in tmpl:
                if p.tag == XSL + "param":
                    name = p.get("name")
                    if name in passed:
                        vars_[name] = passed[name]
                    elif p.get("select"):
                        vars_[name] = _eval(_ast(p.get("select")), ctx)
                    else:
                        vars_[name] = ""
            sub = Context(ctx.node, ctx.pos, ctx.size, vars_, ctx.current,
                          ctx.doc, ctx.nsmap)
            self._apply(tmpl, sub, out)
        elif tag in (XSL + "param", XSL + "output"):
            pass  # params bound at template entry; output method=text assumed
        elif tag == XSL + "comment":
            pass
        else:
            raise ValueError(f"unsupported XSLT instruction {tag}")
