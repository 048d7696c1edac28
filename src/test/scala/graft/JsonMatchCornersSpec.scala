package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonMatch

/** Round-2 advisor findings re-verified as regression pins: the evaluator
  * already implemented these reference corners (match.go:87-100 missing-key,
  * match.go:139-153 contains-all, operators.go:149-246 scalar-arg \$in and
  * array-arg \$startsWith). */

class JsonMatchCornersSpec extends AnyFunSuite {
  test("missing-key $neq fails (reference semantics)") {
    assert(!JsonMatch.matches("""{"type":{"$neq":"created"}}""", """{}"""))
    assert(!JsonMatch.matches("""{"type":{"$nin":["a"]}}""", """{}"""))
    assert(JsonMatch.matches("""{"type":{"$exist":false}}""", """{}"""))
  }
  test("array-literal schema contains-all") {
    assert(JsonMatch.matches("""{"tags":["a","b"]}""", """{"tags":["a","b"]}"""))
    assert(JsonMatch.matches("""{"tags":["a","b"]}""", """{"tags":["b","c","a"]}"""))
    assert(!JsonMatch.matches("""{"tags":["a","z"]}""", """{"tags":["a","b"]}"""))
  }
  test("$in scalar args: substring + array-contains") {
    assert(JsonMatch.matches("""{"k":{"$in":"else"}}""", """{"k":"something else"}"""))
    assert(!JsonMatch.matches("""{"k":{"$in":"xyz"}}""", """{"k":"something else"}"""))
    assert(JsonMatch.matches("""{"k":{"$in":2}}""", """{"k":[1,2,3]}"""))
    assert(!JsonMatch.matches("""{"k":{"$nin":2}}""", """{"k":[1,2,3]}"""))
    assert(JsonMatch.matches("""{"k":{"$startsWith":["x","some"]}}""", """{"k":"something"}"""))
  }
}
