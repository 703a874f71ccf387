package graft.eth

import org.scalatest.funsuite.AnyFunSuite

/** ABI-decode golden fixtures ported from the reference
  * (tests/input_parsing_tests.py:14-26).
  */
class AbiSpec extends AnyFunSuite {

  private val erc20Abi =
    """[
      {"constant":false,"inputs":[{"name":"dst","type":"address"},{"name":"wad","type":"uint256"}],
       "name":"transfer","outputs":[{"name":"","type":"bool"}],"payable":false,"type":"function"},
      {"constant":false,"inputs":[{"name":"src","type":"address"},{"name":"dst","type":"address"},{"name":"wad","type":"uint256"}],
       "name":"transferFrom","outputs":[{"name":"","type":"bool"}],"payable":false,"type":"function"},
      {"anonymous":false,"inputs":[{"indexed":true,"name":"from","type":"address"},{"indexed":true,"name":"to","type":"address"},{"indexed":false,"name":"value","type":"uint256"}],
       "name":"Transfer","type":"event"}
    ]"""

  test("golden: transfer(address,uint256) call data") {
    val input = "0xa9059cbb000000000000000000000000d11b80088ce2623a9c017b93008405511cd951d2" +
      "00000000000000000000000000000000000000000000000d343b16da9c1a4000"
    val got = Abi.decodeInput(erc20Abi, input)
    assert(got.isDefined)
    assert(got.get.name === "transfer")
    assert(got.get.params.map(_.`type`) === Seq("address", "uint256"))
    assert(got.get.params.map(_.value) ===
      Seq("0xd11b80088ce2623a9c017b93008405511cd951d2", "243571300000000000000"))
  }

  test("golden: reconstructed Transfer event pseudo-input") {
    val input = "0xddf252ad0000000000000000000000008ee1b78513c53702ae25f0f155e6ff31dda409ba" +
      "0000000000000000000000000d0707963952f2fba59dd06f2b425ace40b492fe" +
      "0000000000000000000000000000000000000000000000008ac7230489e80000"
    val got = Abi.decodeInput(erc20Abi, input)
    assert(got.isDefined)
    assert(got.get.name === "Transfer")
    assert(got.get.params.map(_.`type`) === Seq("address", "address", "uint256"))
    assert(got.get.params.map(_.value) === Seq(
      "0x8ee1b78513c53702ae25f0f155e6ff31dda409ba",
      "0x0d0707963952f2fba59dd06f2b425ace40b492fe",
      "10000000000000000000"))
  }

  test("no selector match returns None") {
    assert(Abi.decodeInput(erc20Abi, "0xdeadbeef" + "0" * 64).isEmpty)
  }

  test("malformed arguments skip the entry (AssertionError analog)") {
    // transfer selector but truncated args
    assert(Abi.decodeInput(erc20Abi, "0xa9059cbb00ff").isEmpty)
  }

  test("dynamic types: string and bytes and arrays decode") {
    val abi =
      """[{"type":"function","name":"post",
          "inputs":[{"name":"s","type":"string"},{"name":"ns","type":"uint256[]"}]}]"""
    val sel = Abi.methodId("post", Seq("string", "uint256[]"))
    // head: offset(s)=0x40, offset(ns)=0x80
    // tail s: len=5 "hello"; tail ns: len=2, [7, 9]
    val data =
      "0000000000000000000000000000000000000000000000000000000000000040" +
        "0000000000000000000000000000000000000000000000000000000000000080" +
        "0000000000000000000000000000000000000000000000000000000000000005" +
        "68656c6c6f000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000000002" +
        "0000000000000000000000000000000000000000000000000000000000000007" +
        "0000000000000000000000000000000000000000000000000000000000000009"
    val got = Abi.decodeInput(abi, "0x" + sel + data)
    assert(got.isDefined)
    assert(got.get.params.map(_.value) === Seq("hello", "[7, 9]"))
  }

  test("canonical types: uint normalizes to uint256 in the selector") {
    assert(Abi.methodId("transfer", Seq("address", "uint")) ===
      Abi.methodId("transfer", Seq("address", "uint256")))
  }

  private def w(hex: String): String = ("0" * (64 - hex.length)) + hex

  test("dynamic-element array: string[] decodes through nested offsets") {
    val abi =
      """[{"type":"function","name":"tag",
          "inputs":[{"name":"names","type":"string[]"}]}]"""
    val sel = Abi.methodId("tag", Seq("string[]"))
    val data =
      w("20") + // offset of the array
        w("2") + // len; element head region starts here + 0x20
        w("40") + // elem 0 offset, relative to the region
        w("80") + // elem 1 offset
        w("3") + "616263" + "0" * 58 + // "abc"
        w("2") + "6869" + "0" * 60 // "hi"
    val got = Abi.decodeInput(abi, "0x" + sel + data)
    assert(got.isDefined)
    assert(got.get.params.map(_.`type`) === Seq("string[]"))
    assert(got.get.params.map(_.value) === Seq("[abc, hi]"))
  }

  test("static tuple: components inline, tuple signature hashes the selector") {
    val abi =
      """[{"type":"function","name":"move",
          "inputs":[
            {"name":"p","type":"tuple","components":[
              {"name":"amount","type":"uint256"},
              {"name":"dst","type":"address"}]},
            {"name":"ok","type":"bool"}]}]"""
    // selector over the canonical tuple form
    val sel = Keccak256.selector("move((uint256,address),bool)")
    val data =
      w("7") + // p.amount (inline: static tuple)
        w("d11b80088ce2623a9c017b93008405511cd951d2") + // p.dst
        w("1") // ok
    val got = Abi.decodeInput(abi, "0x" + sel + data)
    assert(got.isDefined)
    assert(got.get.name === "move")
    assert(got.get.params.map(_.`type`) === Seq("(uint256,address)", "bool"))
    assert(got.get.params.map(_.value) ===
      Seq("(7, 0xd11b80088ce2623a9c017b93008405511cd951d2)", "True"))
  }

  test("dynamic tuple: offsets inside the tuple region are region-relative") {
    val abi =
      """[{"type":"function","name":"note",
          "inputs":[{"name":"p","type":"tuple","components":[
            {"name":"text","type":"string"},
            {"name":"n","type":"uint256"}]}]}]"""
    val sel = Keccak256.selector("note((string,uint256))")
    val data =
      w("20") + // offset of the tuple
        w("40") + // text offset, relative to the tuple region
        w("5") + // n (inline in the tuple head)
        w("5") + "68656c6c6f" + "0" * 54 // "hello"
    val got = Abi.decodeInput(abi, "0x" + sel + data)
    assert(got.isDefined)
    assert(got.get.params.map(_.`type`) === Seq("(string,uint256)"))
    assert(got.get.params.map(_.value) === Seq("(hello, 5)"))
  }

  test("tuple array: (uint256,bool)[] with static components") {
    val abi =
      """[{"type":"function","name":"flags",
          "inputs":[{"name":"ps","type":"tuple[]","components":[
            {"name":"n","type":"uint256"},
            {"name":"b","type":"bool"}]}]}]"""
    val sel = Keccak256.selector("flags((uint256,bool)[])")
    val data =
      w("20") + // offset of the array
        w("2") + // len; static tuples inline in the element region
        w("1") + w("1") + // (1, True)
        w("2") + w("0") // (2, False)
    val got = Abi.decodeInput(abi, "0x" + sel + data)
    assert(got.isDefined)
    assert(got.get.params.map(_.value) === Seq("[(1, True), (2, False)]"))
  }
}
