package graft.core

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Behavior ported from reference InputTest.scala:13-77. */
final class InputSpec extends AnyFunSuite {

  def input(name: String): Input = Input(name, Instant.now)

  test("input parts") {
    val i = input("a/foo/bar/baz")
    assert(i.basename == "baz")
    assert(i.dirname == "a/foo/bar/")
  }

  test("source prefix must end with /") {
    assertThrows[IllegalArgumentException] {
      Input.Source("foo", "bar")
    }
  }

  test("source basename must not end with /") {
    assertThrows[IllegalArgumentException] {
      Input.Source("foo/", "bar/")
    }
  }

  test("source match inputs") {
    val a = Input.Source("a/*/", "bar")
    val b = Input.Source("b/test=*/", "*")
    assert(a.matches(input("a/foo/bar")))
    assert(b.matches(input("b/test=foo/any")))
  }

  test("source pattern matching prefix") {
    val source = Input.Source("a/test=*/bar/*/", "baz")
    input("a/test=foo/bar/test/baz") match {
      case source(foo, test) => assert(foo == "foo" && test == "test")
      case _                 => fail("match failed")
    }
  }

  test("source pattern matching basename") {
    val source = Input.Source("a/test=*/bar/*/", "b*")
    input("a/test=foo/bar/test/baz") match {
      case source(foo, test, az) =>
        assert(foo == "foo" && test == "test" && az == "az")
      case _ => fail("match failed")
    }
  }

  test("source factories") {
    assert(Input.Source.Raw("a/b/c") == Input.Source("a/b/", "c"))
    assert(Input.Source.Dataset("x/*/") == Input.Source("x/*/", "metadata"))
    assert(Input.Source.Success("out/*/") == Input.Source("out/*/", "_SUCCESS"))
    assertThrows[IllegalArgumentException](Input.Source.Raw("nokey"))
  }
}
