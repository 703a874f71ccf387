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
}
