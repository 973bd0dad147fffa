package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The reference HTML/CSS parsers' OUTPUT CONTRACT as golden assertions —
  * the JsReferenceContractSpec discipline applied to the last two parser
  * families. The reference ships NO HTML/CSS test fixtures (tests/ has
  * none; verified r10), so expectations are derived from the parser
  * SOURCE with the family each assertion mirrors cited by line:
  *   HTML elements-with-id (`analysis/html_parser.py:106-133`),
  *   components — custom elements + data-component (:134-182),
  *   links/resources/form actions (:183-235), class references
  *   (:235-258), inline <style> CSS entities (:322-389);
  *   CSS class definitions (`analysis/css_parser.py:98-135`), id
  *   definitions (:136-173), variables (:174-209), @import relations
  *   (:210-235).
  */
class HtmlCssReferenceContractSpec extends AnyFunSuite {

  private val html = """<!DOCTYPE html>
<html>
<head>
  <title>Dashboard &amp; Reports</title>
  <meta name="description" content="Team metrics dashboard">
  <link rel="stylesheet" href="styles/app.css">
  <style>
    .hero { color: red; }
    #banner { width: 100%; }
    :root { --accent: #ff0000; }
  </style>
</head>
<body>
  <h1>Metrics</h1>
  <div id="main" class="container wide">
    <nav-bar theme="dark"></nav-bar>
    <div data-component="UserCard" class="card"></div>
    <a href="/reports">Reports</a>
    <a href="https://example.org/docs">Docs</a>
    <form action="/submit" method="post"><input id="q"></form>
  </div>
  <script src="js/app.js"></script>
</body>
</html>"""

  private val res = HtmlParser.parse("page.html", html)
  private def entity(name: String) = res.entities.find(_.name == name)

  test("elements with ids become entities (html_parser.py:106-133)") {
    assert(entity("#main").isDefined)
    assert(entity("#q").isDefined)
    assert(entity("#main").get.observations.exists(_.contains("<div>")))
  }

  test("custom elements and data-components are class entities (:134-182)") {
    val nav = entity("<nav-bar>")
    assert(nav.isDefined && nav.get.entityType == "class")
    assert(nav.get.observations.exists(_.contains("Custom HTML component: nav-bar")))
    val card = entity("Component:UserCard")
    assert(card.isDefined && card.get.entityType == "class")
  }

  test("hrefs, asset srcs, and form actions become relations (:183-235)") {
    val rels = res.relations.map(r => (r.toEntity, r.relationType))
    assert(rels.contains(("/reports", "references")))
    assert(rels.contains(("https://example.org/docs", "references")))
    assert(rels.contains(("js/app.js", "references")))
    assert(res.relations.exists(r =>
      r.toEntity == "/submit" && r.importType == "form_action"))
  }

  test("class attributes surface as css-class uses (:235-258)") {
    val uses = res.relations.filter(_.relationType == "uses").map(_.toEntity).toSet
    assert(Set(".container", ".wide", ".card").subsetOf(uses))
  }

  test("inline <style> runs the CSS extraction (:322-389)") {
    assert(entity(".hero").isDefined)
    assert(entity("#banner").isDefined)
    assert(entity("--accent").isDefined)
    // inline entities are re-homed onto the HTML file
    assert(entity(".hero").get.filePath == "page.html")
  }

  private val css = """/* theme tokens */
:root { --brand: #0033ff; --pad-sm: 4px; }
.btn, .btn-primary:hover { color: var(--brand); }
div.panel > .panel-header { padding: var(--pad-sm); }
#sidebar { width: 240px; }
@import url("base/reset.css");
@import "vendor/grid.css";
@media (max-width: 600px) { .btn { display: block; } }
@keyframes fade-in { from { opacity: 0; } to { opacity: 1; } }"""

  private val cres = CssParser.parse("app.css", css)
  private def centity(name: String) = cres.entities.find(_.name == name)

  test("css class definitions come from SELECTOR spans only (css_parser.py:98-135)") {
    for (c <- Seq(".btn", ".btn-primary", ".panel", ".panel-header"))
      assert(centity(c).isDefined, c)
    // hex colors in declarations must NOT read as id definitions
    assert(centity("#0033ff").isEmpty && centity("#ff0000").isEmpty)
  }

  test("id and variable definitions (:136-209)") {
    assert(centity("#sidebar").isDefined)
    assert(centity("--brand").isDefined && centity("--pad-sm").isDefined)
    assert(centity("--brand").get.entityType == "constant")
  }

  test("@import edges in both url() and bare string form (:210-235)") {
    val imports = cres.relations.filter(_.relationType == "imports").map(_.toEntity).toSet
    assert(imports == Set("base/reset.css", "vendor/grid.css"))
  }

  test("@keyframes are named definitions; rules inside @media still count") {
    assert(centity("@keyframes fade-in").isDefined)
    // .btn inside the media block dedupes with the top-level definition
    assert(cres.entities.count(_.name == ".btn") == 1)
  }
}
