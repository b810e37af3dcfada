package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Behavior ported from reference GlobTest.scala:8-49. */
final class GlobSpec extends AnyFunSuite {
  import Glob.stringToGlob

  test("should match") {
    val glob: Glob = "*/foo*/*/baz"
    assert(glob.matches("/foobar/ack/baz"))
    assert(glob.matches("some/foo/anything=here/baz"))
  }

  test("should not match") {
    val glob: Glob = "*/foo*/*/baz"
    assert(!glob.matches("/foo"))
    assert(!glob.matches("bar/foo"))
    assert(!glob.matches("zoo/whee/foo"))
    assert(!glob.matches("foo"))
    assert(!glob.matches("ack/foo/bar"))
    assert(!glob.matches("/foobar/ack/baz/whee"))
    assert(!glob.matches("/foobar/ack/baz-whee"))
    assert(!glob.matches("more/foo/anything/here/baz"))
    assert(!glob.matches("prefix/more/foo/anything/here/baz"))
  }

  test("partial match") {
    val glob: Glob = "foo/bar/"
    assert(glob.matches("foo/bar/baz", partial = true))
    assert(glob.matches("foo/bar/baz/whee", partial = true))
    assert(!glob.matches("foobar/baz", partial = true))
    assert(!glob.matches("foo/bar", partial = true))
    assert(!glob.matches("foo/", partial = true))
  }

  test("pattern matching globs") {
    val glob: Glob = "*/wow=*/ancestor=*/*/this"
    "foo/wow=awesome/ancestor=grandfather//this" match {
      case glob(start, wow, ancestor, end) =>
        assert(start == "foo")
        assert(wow == "awesome")
        assert(ancestor == "grandfather")
        assert(end.isEmpty)
      case _ => fail("glob did not match")
    }
  }

  test("possessive star: capture stops at first next-literal, no backtracking") {
    // takeWhile semantics: '*' consumes up to the FIRST 'a', then the
    // literal tail must match with no backtracking.
    val glob: Glob = "*ab"
    assert(glob.matches("xab"))
    assert(!glob.matches("xaab"))
  }

  test("star does not cross the path separator") {
    assert(!Glob("*").matches("a/b"))
    assert(Glob("*/*").matches("a/b"))
  }

  test("empty glob matches nothing") {
    assert(!Glob("").matches(""))
    assert(!Glob("").matches("x", partial = true))
  }

  test("unapplySeq is prefix-partial (reference extractor semantics)") {
    val glob: Glob = "foo/"
    "foo/bar/baz" match {
      case glob() => ()
      case _      => fail("prefix extractor should match longer key")
    }
  }

  test("property: literal globs match only themselves (full mode)") {
    val gen = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('/'), 1 -> Gen.oneOf("-._=:"))
    ).map(_.mkString)
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      val s = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      assert(Glob(s).matches(s), s"glob '$s' should self-match")
      assert(!Glob(s).matches(s + "!"), s"glob '$s' should not match extended")
    }
  }
}
