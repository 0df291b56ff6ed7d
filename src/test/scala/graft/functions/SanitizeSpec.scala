package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}

class SanitizeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  // Golden cases ≡ fix_string (assets.py:304-336)
  test("fixString: % → porcentaje_ before generic special handling") {
    assert(Sanitize.fixString("% descuento") == "porcentaje_descuento")
  }
  test("fixString: ñ/Ñ mapped, specials to _, runs collapsed") {
    assert(Sanitize.fixString("niño año") == "nino_ano")
    assert(Sanitize.fixString("a  b..c") == "a_b_c")
    assert(Sanitize.fixString("x;y--z") == "x_y_z")
  }
  test("fixString: porcentaje_ collapse with neighboring specials") {
    // '%' → 'porcentaje_' then ' ' → '_' gives '__' which collapses
    assert(Sanitize.fixString("% x") == "porcentaje_x")
  }

  // Golden cases ≡ sanitize_db_name (assets.py:338-344)
  test("sanitizeDbName strips non-ascii and non-word, truncates at 63") {
    assert(Sanitize.sanitizeDbName("café-table!") == "caftable")
    assert(Sanitize.sanitizeDbName("a" * 100).length == 63)
  }

  test("unidecode transliterates Latin accents") {
    assert(Sanitize.unidecode("café año José") == "cafe ano Jose")
    assert(Sanitize.unidecode("Müller œuvre") == "Muller oeuvre")
  }

  test("tableName pipeline ≡ assets.py:53-56") {
    assert(Sanitize.tableName("ventas 2023", "Enero") == "ventas_2023_Enero")
    assert(Sanitize.tableName("año fiscal", "día 1") == "ano_fiscal_dia_1")
  }

  // Properties (SURVEY.md §5)
  test("fixString is idempotent") {
    check(Prop.forAll { (s: String) =>
      val once = Sanitize.fixString(s)
      Sanitize.fixString(once) == once
    })
  }
  test("sanitizeDbName is idempotent, ascii-word-only, ≤63 chars") {
    check(Prop.forAll { (s: String) =>
      val once = Sanitize.sanitizeDbName(s)
      Sanitize.sanitizeDbName(once) == once &&
        once.forall(c => (c.isLetterOrDigit && c < 128) || c == '_') &&
        once.length <= 63
    })
  }
}
