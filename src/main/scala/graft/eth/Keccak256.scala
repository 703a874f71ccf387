package graft.eth

/** Keccak-256 (original Keccak padding 0x01, NOT the SHA3-256 0x06
  * variant) — implemented from the public Keccak specification. Used to
  * derive 4-byte method selectors for the `standard_*` contract flags
  * (reference: /root/reference/operations/contract_transactions.py:12-27
  * does the same via Web3.sha3).
  */
object Keccak256 {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y]
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  @inline private def rotl(v: Long, n: Int): Long =
    if (n == 0) v else (v << n) | (v >>> (64 - n))

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** 32-byte Keccak-256 digest. */
  def hash(message: Array[Byte]): Array[Byte] = {
    val rate = 136 // bytes, for capacity 512
    val state = new Array[Long](25)
    // pad: 0x01 ... 0x80 (single-byte case: 0x81)
    val padded = new Array[Byte](((message.length / rate) + 1) * rate)
    System.arraycopy(message, 0, padded, 0, message.length)
    padded(message.length) = 0x01
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80.toByte).toByte
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) {
          lane = (lane << 8) | (padded(off + i * 8 + j) & 0xffL)
          j -= 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = ((state(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString

  def hashHex(message: String): String = hex(hash(message.getBytes("UTF-8")))

  /** First 4 bytes of keccak256(signature), hex — the EVM method/event
    * selector (e.g. "transfer(address,uint256)" -> "a9059cbb").
    */
  def selector(signature: String): String = hashHex(signature).substring(0, 8)
}
