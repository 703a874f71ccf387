package graft.eth

import org.scalatest.funsuite.AnyFunSuite

class KeccakSelectorsSpec extends AnyFunSuite {

  test("keccak256 of empty string matches the known digest") {
    assert(Keccak256.hashHex("") ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("ERC-20 method selectors match the published values") {
    assert(Selectors.erc20("transfer") === "a9059cbb")
    assert(Selectors.erc20("transferFrom") === "23b872dd")
    assert(Selectors.erc20("approve") === "095ea7b3")
    assert(Selectors.erc20("balanceOf") === "70a08231")
    assert(Selectors.erc20("totalSupply") === "18160ddd")
    assert(Selectors.erc20("allowance") === "dd62ed3e")
    assert(Selectors.erc223("tokenFallback") === "c0ee0b8a")
  }

  test("event topic hashes match the reference constants") {
    // reference: /root/reference/operations/token_holders.py:5 and
    // bancor_trades.py:5 hard-code these topics; our keccak derives them
    assert("0x" + Keccak256.hashHex("Transfer(address,address,uint256)") ===
      DerivedViews.TransferTopic)
    assert("0x" + Keccak256.hashHex(
      "Conversion(address,address,address,uint256,uint256,int256)") ===
      DerivedViews.ConversionTopic)
  }
}
