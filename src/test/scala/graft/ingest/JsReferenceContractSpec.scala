package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The reference JS/TS parser's OUTPUT CONTRACT as golden assertions —
  * the ReferenceFixtureSpec discipline extended to WebParsers. The
  * reference ships NO JS/TS test fixtures (tests/unit has none; verified
  * r10), so these expectations are derived from the parser SOURCE
  * (`claude_indexer/analysis/javascript_parser.py`), with the extraction
  * family each assertion mirrors cited by line:
  *   functions incl. arrow/method (:83-98), classes (:100-109),
  *   interfaces (:395-437), variables/fields (:121-131), imports
  *   (:438-485), JSON-loading patterns (:486-556), call relations
  *   (:557-590), inheritance (:591-663), exceptions (:664-687),
  *   decorators (:688-711).
  */
class JsReferenceContractSpec extends AnyFunSuite {

  private val src = """import { BaseUser } from './base';
import axios from 'axios';
const fs = require('fs');

export const MAX_RETRIES = 3;
let cache = {};

export async function fetchUser(id, opts) {
  const url = buildUrl(id);
  try {
    const resp = await fetch(url);
    return JSON.parse(resp.body);
  } catch (err) {
    logError(err);
    throw err;
  }
}

const formatName = (user) => {
  return user.first + ' ' + user.last;
};

interface Auditable extends Timestamped {
  auditLog(): void;
}

@injectable
export class AdminUser extends BaseUser implements Auditable {
  role: string = 'admin';
  static count = 0;

  login(password) {
    this.validate(password);
    return startSession(this);
  }

  logout = async () => {
    await endSession(this);
  };
}

export { fetchUser as getUser, formatName };
export * from './helpers';
"""

  private lazy val r = JsParser.parse("users.ts", src)
  private def entity(n: String) = r.entities.find(_.name == n).get
  private def rels(t: String) = r.relations.filter(_.relationType == t)
    .map(x => (x.fromEntity, x.toEntity)).toSet

  test("function family: declaration + arrow, async flag, calls, exceptions (js_parser.py:83-98,218-354,557-687)") {
    val f = entity("fetchUser")
    assert(f.entityType == "function" && f.lineNumber == 8 && f.endLineNumber == 17)
    assert(f.observations.contains("signature: function fetchUser(id, opts)"))
    assert(f.observations.contains("calls: buildUrl, fetch, parse, logError"))
    assert(f.observations.contains("handles exceptions: err"))
    assert(f.observations.contains("async function"))
    val a = entity("formatName")
    assert(a.entityType == "function" && a.observations.contains("arrow function"))
    assert(rels("calls").contains(("fetchUser", "buildUrl")))
    // `async () =>` must NOT register a phantom call named "async"
    assert(!rels("calls").contains(("logout", "async")))
    assert(rels("calls") == Set(
      ("fetchUser", "buildUrl"), ("fetchUser", "fetch"), ("fetchUser", "parse"),
      ("fetchUser", "logError"), ("login", "validate"), ("login", "startSession"),
      ("logout", "endSession")))
  }

  test("class family: extends + implements + decorator + key methods (js_parser.py:355-394,591-663,688-711)") {
    val c = entity("AdminUser")
    assert(c.entityType == "class" && c.lineNumber == 28 && c.endLineNumber == 40)
    assert(c.observations.contains("extends: BaseUser"))
    assert(c.observations.contains("decorators: injectable"))
    assert(rels("extends") == Set(("AdminUser", "BaseUser"), ("Auditable", "Timestamped")))
    assert(rels("implements") == Set(("AdminUser", "Auditable")))
  }

  test("class members: methods (plain + arrow field) and fields incl. unmodified (js_parser.py:129-131)") {
    assert(entity("login").entityType == "method")
    assert(entity("login").observations.contains("member of: AdminUser"))
    val lo = entity("logout")
    assert(lo.entityType == "method" && lo.observations.contains("arrow function")
      && lo.observations.contains("async function"))
    // `role: string = 'admin'` has NO modifier keyword and must still be a field
    assert(entity("role").observations.contains("field: role"))
    assert(entity("count").observations.contains("field: count"))
    assert(rels("contains").contains(("AdminUser", "role")))
  }

  test("interface: block extent + impl chunk + extends (js_parser.py:395-437)") {
    val i = entity("Auditable")
    assert(i.entityType == "interface" && i.lineNumber == 23 && i.endLineNumber == 25)
    assert(r.implementationChunks.exists(c =>
      c.entityName == "Auditable" && c.content.contains("auditLog")))
  }

  test("imports + module-level variables (js_parser.py:438-485,121-128)") {
    assert(rels("imports") == Set(
      ("users.ts", "./base"), ("users.ts", "axios"), ("users.ts", "fs")))
    assert(entity("MAX_RETRIES").entityType == "constant")
    assert(entity("cache").entityType == "variable")
  }

  test("JSON-loading / fetch IO patterns (js_parser.py:486-556)") {
    val io = r.relations.filter(_.importType.startsWith("io:"))
      .map(x => (x.fromEntity, x.importType)).toSet
    assert(io == Set(("fetchUser", "io:fetch"), ("fetchUser", "io:JSON.parse")))
  }

  test("export surface: aliased named exports + star re-export") {
    assert(rels("exports") == Set(("users.ts", "getUser"), ("users.ts", "formatName")))
    assert(rels("reexports") == Set(("users.ts", "./helpers")))
  }

  test("implementation chunks carry brace-matched extents") {
    val byName = r.implementationChunks.map(c => c.entityName -> c).toMap
    assert(byName("fetchUser").content.contains("JSON.parse(resp.body)"))
    assert(byName("AdminUser").content.contains("logout = async"))
    assert(byName.contains("login") && byName.contains("logout"))
  }

  // ===== r11: the exotic-syntax families the r10 verdict listed as the
  // remaining gap to the reference =====

  test("TS generics in heritage clauses: base names without args (js_parser.py:591-663)") {
    // tree-sitter exposes the bare type_identifier NEXT TO its
    // type_arguments, so the reference records `Base`, never `Base<T>`
    val g = JsParser.parse("generic.ts",
      """export class Box<T> extends Base<T> implements Listable<T>, Closeable {
        |  item: T;
        |}
        |interface Repo<T> extends Store<Map<K, V>>, Auditable {
        |  find(id: string): T;
        |}
        |""".stripMargin)
    val ext = g.relations.filter(_.relationType == "extends")
      .map(x => (x.fromEntity, x.toEntity)).toSet
    val impl = g.relations.filter(_.relationType == "implements")
      .map(x => (x.fromEntity, x.toEntity)).toSet
    assert(ext == Set(("Box", "Base"), ("Repo", "Store"), ("Repo", "Auditable")))
    assert(impl == Set(("Box", "Listable"), ("Box", "Closeable")))
    assert(g.entities.exists(e => e.name == "Box" && e.entityType == "class"))
    assert(g.entities.exists(e => e.name == "Repo" && e.entityType == "interface"))
  }

  test("JSX spread props: component extracted, no spurious bindings (tsx surface)") {
    val g = JsParser.parse("card.tsx",
      """import React from 'react';
        |export const Card = ({ title, ...rest }: CardProps) => {
        |  const label = formatTitle(title);
        |  return <Panel {...rest} header={label} onClick={() => track(title)}>
        |    <span className="card-body">{label}</span>
        |  </Panel>;
        |};
        |""".stripMargin)
    val card = g.entities.find(_.name == "Card").get
    assert(card.entityType == "function")
    assert(card.observations.contains("arrow function"))
    val calls = g.relations.filter(r => r.relationType == "calls" && r.fromEntity == "Card")
      .map(_.toEntity).toSet
    assert(calls.contains("formatTitle") && calls.contains("track"))
    // the spread + JSX braces bind nothing: no `rest`/`label` entities
    assert(!g.entities.exists(e => Set("rest", "label", "title").contains(e.name)))
  }

  test("destructuring declarations: shorthand/renamed/default/nested/rest (js_parser.py:958-1105)") {
    val g = JsParser.parse("cfg.js",
      """const { host, port = 8080, auth: credentials, addr: { street, city }, ...others } = config;
        |const [first, second, ...tail] = items;
        |const { index, tmp, i } = counters;
        |function setup() {
        |  const { localOnly } = opts;
        |}
        |""".stripMargin)
    val vars = g.entities.filter(_.entityType == "variable").map(_.name).toSet
    // renamed pair binds the VALUE side; nested patterns recurse; rest binds
    assert(vars == Set("host", "port", "credentials", "street", "city",
      "others", "first", "second", "tail"))
    // reference's _should_include_variable: temp names skipped even at
    // module level (js_parser.py:1131-1133); function-locals never bind
    assert(!vars.contains("index") && !vars.contains("tmp") && !vars.contains("i"))
    assert(!vars.contains("localOnly"))
  }

  test("CSS at-rules: @supports-nested classes count, @font-face binds nothing (css_parser.py:98-135)") {
    val c = CssParser.parse("app.css",
      """@supports (display: grid) {
        |  .grid-layout { display: grid; }
        |}
        |@font-face { font-family: 'Inter'; src: url('/inter.woff2'); }
        |@import url("theme.css") screen;
        |""".stripMargin)
    val names = c.entities.map(_.name).toSet
    // the reference finds rule_set nodes RECURSIVELY, so at-rule-nested
    // selectors still yield class entities; @font-face has declarations
    // only (no rule_set selectors) and binds nothing
    assert(names.contains(".grid-layout"))
    assert(!names.exists(_.contains("font-face")))
    assert(c.relations.exists(r => r.relationType == "imports" && r.toEntity == "theme.css"))
  }
}
