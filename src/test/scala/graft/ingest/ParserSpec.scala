package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Ids

class ParserSpec extends AnyFunSuite {

  test("python: functions, classes, methods, docstrings, calls, inherits") {
    val src =
      """import os
        |from typing import List
        |
        |MAX_SIZE = 100
        |
        |class Base:
        |    pass
        |
        |class Worker(Base):
        |    '''Does the work.'''
        |    def run(self, items: List) -> int:
        |        '''Run over items.'''
        |        total = compute(items)
        |        try:
        |            return total
        |        except ValueError:
        |            return 0
        |
        |def compute(items):
        |    '''Compute a total.'''
        |    if items:
        |        return len(items)
        |    return 0
        |""".stripMargin
    val r = PythonParser.parse("w.py", src)
    val byName = r.entities.map(e => e.name -> e).toMap
    assert(byName("Worker").entityType == "class")
    assert(byName("Worker").docstring == "Does the work.")
    assert(byName("run").entityType == "method")
    assert(byName("run").signature.contains("-> int"))
    assert(byName("compute").entityType == "function")
    assert(byName("MAX_SIZE").entityType == "constant")
    assert(byName("os").entityType == "import")
    val rels = r.relations.map(x => (x.fromEntity, x.relationType, x.toEntity)).toSet
    assert(rels.contains(("Worker", "inherits", "Base")))
    assert(rels.contains(("run", "calls", "compute")))
    assert(rels.contains(("w.py", "imports", "os")))
    assert(rels.contains(("Worker", "contains", "run")))
    assert(byName("run").observations.exists(_.startsWith("handles exceptions: ValueError")))
    // implementation chunk holds the verbatim slice
    val impl = r.implementationChunks.find(_.entityName == "compute").get
    assert(impl.content.contains("def compute(items):"))
    assert(impl.contentHash == Ids.sha256Hex(impl.content))
  }

  test("markdown: headers, chunk grouping, overlap") {
    val md = "# Title\n\nintro text\n\n## Section A\n\n" + ("alpha " * 100) +
      "\n\n## Section B\n\n" + ("beta " * 100)
    val r = MarkdownParser.parse("doc.md", md)
    val names = r.entities.map(_.name)
    assert(names.contains("Title"))
    assert(names.contains("Section A"))
    assert(r.implementationChunks.nonEmpty)
    // all source text is covered by chunks
    assert(r.implementationChunks.map(_.content).mkString.contains("alpha"))
  }

  test("text: 50-line chunks") {
    val txt = (1 to 120).map(i => s"line number $i with content").mkString("\n")
    val r = TextParser.parse("notes.txt", txt)
    assert(r.implementationChunks.length == 3) // 50+50+20
    assert(r.implementationChunks.head.lineNumber == 1)
    assert(r.implementationChunks.head.endLineNumber == 50)
    assert(r.implementationChunks(1).lineNumber == 51)
  }

  test("js: functions, classes, imports") {
    val js =
      """import { thing } from './lib';
        |const helper = (x) => x * 2;
        |export class Widget extends Base {
        |}
        |function render(props) {
        |  return helper(props);
        |}
        |const MAX = 10;
        |""".stripMargin
    val r = JsParser.parse("app.ts", js)
    val byName = r.entities.map(e => e.name -> e.entityType).toMap
    assert(byName("Widget") == "class")
    assert(byName("render") == "function")
    assert(byName("helper") == "function")
    assert(byName("MAX") == "constant")
    val rels = r.relations.map(x => (x.fromEntity, x.relationType, x.toEntity)).toSet
    assert(rels.contains(("app.ts", "imports", "./lib")))
    assert(rels.contains(("Widget", "extends", "Base")))
  }

  test("js: export surface — named lists, aliased names, star and named re-exports") {
    val js =
      """export { alpha, beta as gamma };
        |export * from './core';
        |export { delta } from './other';
        |""".stripMargin
    val r = JsParser.parse("mod.ts", js)
    val rels = r.relations.map(x => (x.fromEntity, x.relationType, x.toEntity, x.importType)).toSet
    // named export list: alias exports the PUBLIC name, not the local one
    assert(rels.contains(("mod.ts", "exports", "alpha", "named")))
    assert(rels.contains(("mod.ts", "exports", "gamma", "named")))
    assert(!rels.exists(t => t._3 == "beta"), "local alias source must not leak as an export")
    // star + named re-exports keep the module edge for the import graph
    assert(rels.contains(("mod.ts", "reexports", "./core", "star")))
    assert(rels.contains(("mod.ts", "reexports", "./other", "named")))
    assert(rels.contains(("mod.ts", "exports", "delta", "reexport")))
  }

  test("ts: methods inside classes, arrow fields, plain fields, decorators, impl chunks") {
    val ts =
      """@Component
        |export class Service implements Runnable {
        |  private cache: Map<string, number> = new Map();
        |  handler = (ev) => this.process(ev.data);
        |  async process(data: string): Promise<number> {
        |    try {
        |      return JSON.parse(data).value + helper(data);
        |    } catch (err) {
        |      return 0;
        |    }
        |  }
        |  static of(): Service { return new Service(); }
        |}
        |function helper(x) { return x.length; }
        |""".stripMargin
    val r = JsParser.parse("svc.ts", ts)
    val byName = r.entities.map(e => e.name -> e).toMap
    assert(byName("Service").entityType == "class")
    assert(byName("Service").observations.exists(_.startsWith("decorators: Component")))
    assert(byName("Service").observations.exists(o =>
      o.startsWith("key methods:") && o.contains("process") && o.contains("of")))
    assert(byName("process").entityType == "method")
    assert(byName("process").observations.contains("async function"))
    assert(byName("process").observations.exists(_.startsWith("handles exceptions: err")))
    assert(byName("handler").entityType == "method") // arrow-function field
    assert(byName("cache").entityType == "variable") // plain field
    assert(byName("of").entityType == "method")
    assert(byName("helper").entityType == "function")
    val rels = r.relations.map(x => (x.fromEntity, x.relationType, x.toEntity)).toSet
    assert(rels.contains(("Service", "contains", "process")))
    assert(rels.contains(("Service", "contains", "handler")))
    assert(rels.contains(("Service", "contains", "cache")))
    assert(rels.contains(("Service", "implements", "Runnable")))
    assert(rels.contains(("process", "calls", "helper")))
    assert(rels.contains(("process", "uses", "JSON.parse")))
    // brace-matched implementation chunks: class spans its whole body
    val implByName = r.implementationChunks.map(c => c.entityName -> c).toMap
    assert(implByName("Service").lineNumber == 2 && implByName("Service").endLineNumber == 13)
    assert(implByName("process").lineNumber == 5 && implByName("process").endLineNumber == 11)
    assert(implByName("helper").content.contains("return x.length"))
    // one-liner bodies still yield their calls (body includes the tail
    // after the opening brace)
    assert(byName("helper").observations.exists(_.startsWith("signature:")))
    assert(rels.contains(("of", "calls", "Service")))
  }

  test("js: braces in string literals don't desync class tracking; async needs word boundary") {
    val js =
      """const CLOSE = "}";
        |const OPEN = '{';
        |const loadAsyncData = (x) => x.map(ff);
        |class Box {
        |  size() { return count(this.v); }
        |}
        |""".stripMargin
    val r = JsParser.parse("box.ts", js)
    val byName = r.entities.map(e => e.name -> e).toMap
    // the literal braces on lines 1-2 must not push depth negative — size()
    // is still recognized as a member of Box
    assert(byName("size").entityType == "method")
    val rels = r.relations.map(x => (x.fromEntity, x.relationType, x.toEntity)).toSet
    assert(rels.contains(("Box", "contains", "size")))
    assert(rels.contains(("size", "calls", "count")))
    // 'Async' inside an identifier is not an async function
    assert(!byName("loadAsyncData").observations.contains("async function"))
  }

  test("yaml: github workflow jobs; json: package deps; ini: sections; csv: columns") {
    val wf = "name: CI\non: push\njobs:\n  build:\n    steps: []\n  test:\n    steps: []\n"
    val ry = YamlParser.parse(".github/workflows/ci.yml", wf)
    assert(ry.entities.map(_.name).contains("CI"))
    assert(ry.entities.count(_.entityType == "function") == 2)

    val pkg = """{"name": "mypkg", "dependencies": {"react": "^18", "lodash": "4"}}"""
    val rj = JsonParser.parse("package.json", pkg)
    assert(rj.entities.map(_.name).contains("mypkg"))
    assert(rj.relations.exists(r => r.relationType == "imports" && r.toEntity == "react"))

    val ini = "[server]\nhost = localhost\nport = 8080\n[client]\ntimeout = 5\n"
    val ri = IniParser.parse("conf.ini", ini)
    assert(ri.entities.map(_.name).toSet.contains("server"))

    val csv = "id,name,score\n1,a,2\n"
    val rc = CsvParser.parse("data.csv", csv)
    assert(rc.entities.map(_.name).contains("data.csv::score"))
  }

  test("python: tuple/star/nested unpack, walrus, design patterns") {
    val src =
      """a, b = 1, 2
        |(c, d), e = (3, 4), 5
        |first, *rest = [1, 2, 3]
        |if (n := 10) > 5:
        |    pass
        |
        |class WidgetFactory:
        |    def create(self):
        |        return 1
        |""".stripMargin
    val r = PythonParser.parse("u.py", src)
    val names = r.entities.filter(e => e.entityType == "variable" || e.entityType == "constant")
      .map(_.name).toSet
    assert(Set("a", "b", "c", "d", "e", "first", "rest").subsetOf(names), names.toString)
    assert(names.contains("n")) // walrus
    val factory = r.entities.find(_.name == "WidgetFactory").get
    assert(factory.observations.contains("design pattern: factory"))
  }

  test("python: RHS/annotation type inference on module variables") {
    val src =
      """name = "graft"
        |count = 42
        |ratio = 0.5
        |flag = True
        |nothing = None
        |items = [1, 2]
        |lookup = {"a": 1}
        |uniq = {1, 2}
        |pair = (1, 2)
        |conn = DatabaseClient(url)
        |remote = pkg.sub.HttpSession()
        |fn = lambda x: x + 1
        |annotated: dict[str, int] = load()
        |mystery = helper()
        |a, b = 1, 2
        |""".stripMargin
    val r = PythonParser.parse("t.py", src)
    def typeOf(n: String): Option[String] =
      r.entities.find(_.name == n).get.observations
        .find(_.startsWith("type: ")).map(_.stripPrefix("type: "))
    assert(typeOf("name").contains("str"))
    assert(typeOf("count").contains("int"))
    assert(typeOf("ratio").contains("float"))
    assert(typeOf("flag").contains("bool"))
    assert(typeOf("nothing").contains("NoneType"))
    assert(typeOf("items").contains("list"))
    assert(typeOf("lookup").contains("dict"))
    assert(typeOf("uniq").contains("set"))
    assert(typeOf("pair").contains("tuple"))
    assert(typeOf("conn").contains("DatabaseClient"))
    assert(typeOf("remote").contains("HttpSession")) // dotted constructor
    assert(typeOf("fn").contains("function"))
    assert(typeOf("annotated").contains("dict[str, int]")) // annotation outranks RHS
    assert(typeOf("mystery").isEmpty) // lowercase call: unknown, not guessed
    assert(typeOf("a").isEmpty && typeOf("b").isEmpty) // unpacks stay untyped
  }

  test("python: Jedi-parity inferred signatures (annotations + default/return literals)") {
    val src =
      """def hello():
        |    '''Say hello.'''
        |    return "Hello, World!"
        |
        |def mix(a: int, b="x", *args, **kw):
        |    return a
        |
        |def gen(n):
        |    yield n
        |
        |def typed(a: dict[str, int], b: str) -> bool:
        |    return check(a, b)
        |
        |def opaque(x):
        |    return helper(x)
        |""".stripMargin
    val r = PythonParser.parse("t.py", src)
    def inferred(n: String): Option[String] =
      r.entities.find(_.name == n).get.observations
        .find(_.startsWith("inferred signature: ")).map(_.stripPrefix("inferred signature: "))
    // the reference's test_parse_simple_function shape: Jedi resolves
    // hello() -> str from the literal return
    assert(inferred("hello").contains("hello() -> str"))
    // annotation + default literal + star-args conventions in one list
    // (commas inside dict[str, int] must not split the param walk)
    assert(inferred("mix").contains("mix(a: int, b: str, args: tuple, kw: dict) -> int"))
    assert(inferred("gen").contains("gen(n) -> generator"))
    // fully annotated + un-inferable return: nothing NEW to say → absent
    assert(inferred("typed").isEmpty)
    assert(inferred("opaque").isEmpty)
  }

  test("python: class instance attributes observation") {
    val src =
      """class Config:
        |    def __init__(self):
        |        self.host = "x"
        |        self.port = 1
        |        self.timeout = 5
        |        self.extra = None
        |""".stripMargin
    val r = PythonParser.parse("c.py", src)
    val cfg = r.entities.find(_.name == "Config").get
    assert(cfg.observations.contains("attributes: host, port, timeout")) // capped at 3
  }

  test("html: ids, links and inline <style> css entities") {
    val html =
      """<html><head><style>
        |.btn { color: red; }
        |#hero { top: 0; }
        |</style></head>
        |<body><div id="main" class="btn wide"><a href="/about">about</a></div></body></html>
        |""".stripMargin
    val r = HtmlParser.parse("page.html", html)
    val names = r.entities.map(_.name).toSet
    assert(names.contains("#main"))
    assert(names.contains(".btn")) // from the inline style block
    assert(names.contains("#hero"))
    val rels = r.relations.map(x => (x.relationType, x.toEntity)).toSet
    assert(rels.contains(("references", "/about")))
    assert(rels.contains(("uses", ".btn")))
  }

  test("html: title/meta ride the file entity; headings become documentation; asset srcs referenced") {
    val html =
      """<html><head><title>My <b>Page</b></title>
        |<meta name="description" content="a demo page">
        |<script src="app.js"></script></head>
        |<body><h1>Welcome</h1><h2 class="sub">Details</h2>
        |<img src="logo.png"></body></html>
        |""".stripMargin
    val r = HtmlParser.parse("page.html", html)
    val fileEnt = r.entities.find(_.entityType == "file").get
    assert(fileEnt.observations.contains("title: My Page"), "tags stripped from the title")
    assert(fileEnt.observations.contains("description: a demo page"))
    val heads = r.entities.filter(_.entityType == "documentation").map(_.name)
    assert(heads == Seq("Welcome", "Details"))
    val rels = r.relations.map(x => (x.relationType, x.toEntity, x.importType)).toSet
    assert(rels.contains(("references", "app.js", "asset")))
    assert(rels.contains(("references", "logo.png", "asset")))
  }

  test("css: compound selectors, @media nesting, no hex-color false ids") {
    val css =
      """/* .commented { } */
        |div.btn:hover, .card .title { color: #fff; background: #a1b2c3; }
        |@media (max-width: 600px) {
        |  .responsive-nav { display: none; }
        |  #mobile-menu { display: block; }
        |}
        |:root { --brand-color: #123456; }
        |@import url("theme.css");
        |""".stripMargin
    val r = CssParser.parse("site.css", css)
    val names = r.entities.map(_.name).toSet
    assert(names.contains(".btn")) // compound selector, not line-start
    assert(names.contains(".card") && names.contains(".title"))
    assert(names.contains(".responsive-nav")) // inside @media
    assert(names.contains("#mobile-menu"))
    assert(names.contains("--brand-color"))
    assert(!names.contains("#fff") && !names.contains("#a1b2c3") &&
      !names.contains("#123456")) // declaration colors are not ids
    assert(!names.contains(".commented")) // comments stripped
    assert(r.relations.exists(x => x.relationType == "imports" && x.toEntity == "theme.css"))
  }

  test("css: keyframes are named entities, media queries are recorded conditions") {
    val css =
      """@keyframes spin { from { transform: rotate(0); } to { transform: rotate(360deg); } }
        |@media (prefers-color-scheme: dark) { body { background: #000; } }
        |""".stripMargin
    val r = CssParser.parse("anim.css", css)
    assert(r.entities.map(_.name).contains("@keyframes spin"))
    assert(r.relations.exists(x => x.relationType == "uses"
      && x.importType == "media_query"
      && x.toEntity == "@media (prefers-color-scheme: dark)"))
  }

  test("python: pandas/pathlib/requests/config/xml file-op families (typed names)") {
    // mirrors reference tests/unit/test_python_file_operations.py expectations
    val src =
      """import pandas as pd
        |from pathlib import Path
        |import configparser
        |import toml
        |import xml.etree.ElementTree as ET
        |
        |df1 = pd.read_csv('sales_data.csv')
        |df2 = pd.read_json('user_data.json')
        |df3 = pd.read_excel('inventory.xlsx')
        |df1.to_csv('output_sales.csv')
        |df2.to_json('output_users.json')
        |df3.to_excel('output_inventory.xlsx')
        |
        |config_text = Path('config.txt').read_text()
        |binary_data = Path('data.bin').read_bytes()
        |Path('output.txt').write_text('results')
        |Path('output.bin').write_bytes(b'binary_results')
        |
        |def fetch():
        |    api_data = requests.get('https://api.example.com/users.json')
        |    result = requests.post('api/upload.json', json={'data': 'test'})
        |    raw = urllib.request.urlopen('https://example.com/feed.xml')
        |    return api_data
        |
        |config = configparser.ConfigParser()
        |config.read('app_settings.ini')
        |pyproject_data = toml.load('pyproject.toml')
        |tree = ET.parse('notes.xml')
        |""".stripMargin
    val r = PythonParser.parse("io.py", src)
    val ops = r.relations.filter(_.importType.startsWith("file_op:"))
      .map(x => (x.fromEntity, x.importType.stripPrefix("file_op:"), x.toEntity)).toSet
    // pandas read + write, module-level → attributed to the file
    assert(ops.contains(("io.py", "pandas_csv_read", "sales_data.csv")))
    assert(ops.contains(("io.py", "pandas_json_read", "user_data.json")))
    assert(ops.contains(("io.py", "pandas_excel_read", "inventory.xlsx")))
    assert(ops.contains(("io.py", "pandas_csv_write", "output_sales.csv")))
    assert(ops.contains(("io.py", "pandas_json_write", "output_users.json")))
    assert(ops.contains(("io.py", "pandas_excel_write", "output_inventory.xlsx")))
    // pathlib: target resolved from the Path('...') receiver
    assert(ops.contains(("io.py", "path_read_text", "config.txt")))
    assert(ops.contains(("io.py", "path_read_bytes", "data.bin")))
    assert(ops.contains(("io.py", "path_write_text", "output.txt")))
    assert(ops.contains(("io.py", "path_write_bytes", "output.bin")))
    // requests/urllib inside a function → attributed to that function
    assert(ops.contains(("fetch", "requests_get", "https://api.example.com/users.json")))
    assert(ops.contains(("fetch", "requests_post", "api/upload.json")))
    assert(ops.contains(("fetch", "urllib_open", "https://example.com/feed.xml")))
    // config + xml
    assert(ops.contains(("io.py", "config_ini_read", "app_settings.ini")))
    assert(ops.contains(("io.py", "toml_read", "pyproject.toml")))
    assert(ops.contains(("io.py", "xml_parse", "notes.xml")))
  }

  test("python: file-op no false positives (no string arg, variables, modes)") {
    val src =
      """import pandas as pd
        |
        |df = pd.DataFrame({'a': [1, 2, 3]})
        |result = df.sum()
        |var_name = 'data.csv'
        |df2 = pd.read_csv(var_name)
        |""".stripMargin
    val r = PythonParser.parse("nf.py", src)
    val ops = r.relations.filter(_.importType.startsWith("file_op:"))
    // read_csv(var) has no string literal → falls back to op-name target only
    assert(ops.forall(_.toEntity != "data.csv"))
    assert(!ops.exists(o => o.importType == "file_op:pandas_csv_write"))
    // open('f.txt', 'r'): the mode never becomes a relation target
    val r2 = PythonParser.parse("m.py", "fh = open('f.txt', 'r')\n")
    val ts = r2.relations.filter(_.importType.startsWith("file_op:")).map(_.toEntity)
    assert(ts.contains("f.txt") && !ts.contains("r"))
  }

  test("python: parameter/docstring/return/framework/async observation families") {
    val src =
      s"""import jwt
         |
         |async def authorize(username: str, db_path: str = None):
         |    ${"\"\"\""}Validates a user and creates a session token.
         |
         |    Args:
         |        username: the login name
         |        db_path: optional database override
         |
         |    Returns:
         |        A signed JWT string for the session.
         |
         |    Raises:
         |        ValueError: if the user is unknown
         |
         |    Examples:
         |        token = await authorize('bob')
         |    ${"\"\"\""}
         |    try:
         |        user = await lookup(username)
         |    except KeyError:
         |        raise ValueError(username)
         |    if user.admin:
         |        return jwt.encode(user)
         |    return None
         |""".stripMargin
    val r = PythonParser.parse("auth.py", src)
    val obs = r.entities.find(_.name == "authorize").get.observations
    assert(obs.contains("parameters: 2: username: str, db_path: str = None"))
    assert(obs.contains("doc params: username, db_path"))
    assert(obs.exists(_.startsWith("doc returns: A signed JWT string")))
    assert(obs.contains("doc raises: ValueError"))
    assert(obs.contains("has usage examples"))
    assert(obs.exists(o => o.startsWith("behaviors: ") && o.contains("validates")))
    assert(obs.contains("returns pattern: multiple (2 different)"))
    assert(obs.exists(o => o.startsWith("framework: ") && o.contains("JWT/Auth")))
    assert(obs.contains("uses await"))
    assert(obs.contains("async error handling"))
    assert(obs.contains("async function"))
    // single-return shape
    val r2 = PythonParser.parse("s.py", "def one():\n    return 42\n")
    val obs2 = r2.entities.find(_.name == "one").get.observations
    assert(obs2.contains("returns pattern: single value (42)"))
  }

  test("registry dispatch + graceful failure") {
    assert(ParserRegistry.canParse("x/y.py"))
    assert(!ParserRegistry.canParse("x/y.exe"))
    val bad = ParserRegistry.parse("f.unknownext", "x")
    assert(bad.errors.nonEmpty)
  }

  test("python: multi-line signatures and parenthesized imports parse whole") {
    val src =
      """from typing import (
        |    List,
        |    Optional,
        |)
        |
        |def fetch(
        |    url: str,
        |    timeout: int = 30,
        |) -> Optional[str]:
        |    '''Fetch a URL.'''
        |    return None
        |
        |class Long(
        |    Base1,
        |    Base2,
        |):
        |    def m(self,
        |          a: int,
        |          b: str = "y(es"):
        |        return a
        |
        |def after():
        |    pass
        |""".stripMargin
    val r = PythonParser.parse("m.py", src)
    val names = r.entities.map(_.name).toSet
    // the multi-line def is one entity, with its annotated params seen
    val fetch = r.entities.find(_.name == "fetch").getOrElse(fail(s"fetch missing in $names"))
    assert(fetch.entityType == "function")
    assert(fetch.observations.exists(_.contains("url: str")),
      s"params lost: ${fetch.observations}")
    // return annotation survives the join
    assert(fetch.observations.exists(o => o.contains("Optional[str]")),
      s"return type lost: ${fetch.observations}")
    // parenthesized from-import yields clean symbol names (no '(' entity)
    assert(names.contains("List") && names.contains("Optional"))
    assert(!names.exists(_.contains("(")), s"paren leaked into a name: $names")
    // multi-line class sees BOTH bases, and its method parses despite the
    // bracket inside a default-value string
    assert(r.relations.exists(rel => rel.fromEntity == "Long" && rel.toEntity == "Base1"))
    assert(r.relations.exists(rel => rel.fromEntity == "Long" && rel.toEntity == "Base2"))
    assert(names.contains("m"))
    // entities after the joined blocks still parse
    assert(names.contains("after"))
    // line numbers anchor at the statement's FIRST physical line
    assert(fetch.lineNumber == 6)
  }

  test("python: backslash continuation in a def header") {
    val src = "def add(a, \\\n        b):\n    return a + b\n"
    val r = PythonParser.parse("b.py", src)
    val add = r.entities.find(_.name == "add").getOrElse(fail("add missing"))
    assert(add.observations.exists(_.contains("2 params")) ||
      add.observations.exists(_.contains("a, b")) ||
      r.entities.exists(_.name == "add"))
  }

  test("ids: deterministic, positive, stable derivation") {
    assert(Ids.pointId("abc") == Ids.pointId("abc"))
    assert(Ids.pointId("abc") > 0)
    assert(Ids.pointId("abc") != Ids.pointId("abd"))
    assert(Ids.sha256Hex("abc") == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(Ids.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }
}
