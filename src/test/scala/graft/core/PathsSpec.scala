package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Behavior ported from reference ImplicitsTest.scala:8-27. */
final class PathsSpec extends AnyFunSuite {
  import paths.KeyOps

  test("basename") {
    assert("foo/bar/baz".basename == "baz")
    assert("foo/".basename == "")
    assert("".basename == "")
    assert("foo.txt".basename == "foo.txt")
  }

  test("dirname") {
    assert("foo/bar/baz".dirname == "foo/bar/")
    assert("foo/bar/baz/".dirname == "foo/bar/baz/")
    assert("foo".dirname == "")
    assert("".dirname == "")
  }

  test("common prefix") {
    assert("foo/bar/baz".commonPrefix == "foo/bar/")
    assert("foo/bar/baz/".commonPrefix == "foo/bar/baz/")
    assert("foo/bar=*/baz".commonPrefix == "foo/bar=")
    assert("foo.txt".commonPrefix == "")
    assert("variants/dataset/phenotype/metadata".commonPrefix == "variants/dataset/phenotype/")
    assert("out/metaanalysis/*/_SUCCESS".commonPrefix == "out/metaanalysis/")
  }
}
