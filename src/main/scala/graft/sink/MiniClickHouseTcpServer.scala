package graft.sink

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}

import ClickHouseNativeTcp._
import MiniClickHouseTcpServer.FxFrames

/** ClickHouse NATIVE TCP protocol fixture — the :9000 wire the reference's
  * clickhouse-go driver dials (internal/client/clickhouse.go). Speaks the
  * server side of the public protocol at revision 54449 (handshake with
  * client-info parse, Ping/Pong, Query with settings-as-strings, streamed
  * Data blocks, Exception packets with real ClickHouse codes,
  * EndOfStream), and shares its BRAIN with [[MiniClickHouseServer]]: the
  * table registry, the Native block decoder and every per-type validator
  * are the same code, so a bad value elicits the identical error code on
  * both transports and the TCP leg's validation is exactly as honest as
  * the HTTP leg's.
  *
  * Like the HTTP fixture it genuinely PARSES what it receives: the whole
  * client-info block is read field-by-field per the revision gates (a
  * mis-framed Query — one missing varint — desynchronizes the stream and
  * fails loudly, which is the point: framing bugs can't hide). */
final class MiniClickHouseTcpServer(val http: MiniClickHouseServer,
                                    tls: Option[javax.net.ssl.SSLContext] = None) {
  import MiniClickHouseServer.CHFault

  /** Server-declared protocol revision (negotiated to min with client).
    * Settable so specs can impersonate an OLD server and prove the client
    * refuses revisions below its settings-as-strings floor. */
  @volatile var serverRevision: Long = ClickHouseNativeTcp.Revision

  private var server: ServerSocket = _
  @volatile private var running = false
  /** Every query text received (settings-passthrough / framing asserts). */
  val receivedQueries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** When set, each successful INSERT is answered with a ROWFUL Log
    * packet before EndOfStream — what a real server sends under
    * send_logs_level; the client must structurally skip it. */
  @volatile var sendLogBlockOnInsert: Boolean = false
  /** Settings of the LAST Query packet, as (name, value) pairs. */
  @volatile var lastSettings: Map[String, String] = Map.empty
  @volatile var lastClientName: String = ""
  /** Compression flag of the LAST Query packet (0 = off, 1 = on). */
  @volatile var lastCompression: Long = 0L
  /** When set, the NEXT compressed response frame ships with one payload
    * byte flipped AFTER its checksum was computed — the client must
    * refuse it loudly (checksum mismatch), never decode garbage. */
  @volatile var corruptNextCompressedFrame: Boolean = false

  def start(): Int = {
    // with TLS this is the server's SECURE native port (:9440 in real
    // deployments — same protocol bytes inside the TLS channel)
    server = tls match {
      case Some(ctx) =>
        ctx.getServerSocketFactory.createServerSocket(0, 64, InetAddress.getLoopbackAddress)
      case None => new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
    }
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val t = new Thread(() => serve(s), "mini-ch-tcp-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => () } // closed during stop()
      }
    }, "mini-ch-tcp-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running = false
    if (server != null) server.close()
  }

  def endpoint: String =
    s"${if (tls.isDefined) "tcps" else "tcp"}://127.0.0.1:${server.getLocalPort}"

  // ---------------------------------------------------------- per connection

  private def serve(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val in = new BufferedInputStream(socket.getInputStream, 1 << 16)
    val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
    try {
      val rev = handshake(in, out) match {
        case Some(r) => r
        case None => return // auth failure: Exception already sent
      }
      var open = true
      while (open) {
        val code =
          try rVarint(in)
          catch { case _: java.io.EOFException => open = false; -1L }
        code match {
          case -1L => ()
          case 4L /* Ping */ =>
            wVarint(out, 4L); out.flush() // Pong
          case 1L /* Query */ =>
            open = handleQuery(in, out, rev)
          case other =>
            sendException(out, 101, s"Unexpected packet $other from client")
            open = false
        }
      }
    } catch {
      case _: Exception => () // broken pipe / desync: drop the connection
    } finally socket.close()
  }

  /** Read ClientHello, answer ServerHello (or Exception 516 on bad
    * credentials). Returns the negotiated revision. */
  private def handshake(in: InputStream, out: OutputStream): Option[Long] = {
    if (rVarint(in) != 0L) { sendException(out, 101, "expected ClientHello"); return None }
    lastClientName = rStr(in)
    rVarint(in); rVarint(in) // client version major/minor
    val clientRev = rVarint(in)
    rStr(in) // database (per-query INSERT text carries its own)
    val u = rStr(in)
    val p = rStr(in)
    if (!http.checkAuth(u, p)) {
      sendException(out, 516,
        s"$u: Authentication failed: password is incorrect, or there is no user with such name")
      return None
    }
    val rev = math.min(serverRevision, clientRev)
    wVarint(out, 0L) // ServerHello
    wStr(out, "MiniClickHouse")
    wVarint(out, 23L); wVarint(out, 8L) // server version major/minor
    wVarint(out, serverRevision)
    if (rev >= 54058) wStr(out, "UTC")
    if (rev >= 54372) wStr(out, "mini-ch")
    if (rev >= 54401) wVarint(out, 0L)
    out.flush()
    Some(rev)
  }

  /** Parse one Query packet + its data stream. Returns false if the
    * connection must close (an Exception was sent mid-INSERT — stream
    * state is undefined, exactly like the real server). */
  private def handleQuery(in: InputStream, out: OutputStream, rev: Long): Boolean = {
    rStr(in) // query id
    // ---- client info (rev >= 54032), field-by-field per the gates
    rByte(in) // query kind
    rStr(in); rStr(in); rStr(in) // initial user / query id / address
    if (rev >= 54449) rI64(in) // initial query start time
    rByte(in) // interface
    rStr(in); rStr(in); rStr(in) // os user / hostname / client name
    rVarint(in); rVarint(in); rVarint(in) // client version major/minor/rev
    if (rev >= 54060) rStr(in) // quota key
    if (rev >= 54448) rVarint(in) // distributed depth
    if (rev >= 54401) rVarint(in) // version patch
    if (rev >= 54442) {
      if (rByte(in) != 0)
        throw new java.io.IOException("OpenTelemetry context not supported by fixture")
    }
    // ---- settings as strings, "" terminates
    val settings = Map.newBuilder[String, String]
    var name = rStr(in)
    while (name.nonEmpty) {
      rVarint(in) // flags
      settings += name -> rStr(in)
      name = rStr(in)
    }
    lastSettings = settings.result()
    if (rev >= 54441) rStr(in) // interserver secret
    rVarint(in) // stage
    val compression = rVarint(in)
    val query = rStr(in)
    receivedQueries.add(query)
    lastCompression = compression

    if (compression != 0L && compression != 1L) {
      sendException(out, 432, s"Unknown compression state $compression")
      return false
    }
    val compress = compression == 1L

    // external-tables data follows EVERY query, terminated by an empty
    // block (the clickhouse-go sequence); the fixture reads and refuses
    // any non-empty external block — parsing it honestly, never skipping
    var extDone = false
    while (!extDone) {
      rVarint(in) match {
        case 2L /* Data */ =>
          if (rev >= 50264) rStr(in)
          inBlock(in, compress) { bin =>
            readBlockInfo(bin, rev)
            readBlockPayload(bin)
          } match {
            case None => extDone = true
            case Some(_) =>
              sendException(out, 48, "external tables not supported by fixture")
              return false
          }
        case other =>
          sendException(out, 101, s"Unexpected packet $other awaiting external tables")
          return false
      }
    }

    val desc = """(?is)^DESCRIBE\s+TABLE\s+(\S+?)\.(\S+?)\s*$""".r
    desc.findFirstMatchIn(query.trim) match {
      case Some(m) =>
        val db = unq(m.group(1)); val tbl = unq(m.group(2))
        http.columnsOf(db, tbl) match {
          case None =>
            sendException(out, 60, s"Table $db.$tbl does not exist")
            return false
          case Some(structure) =>
            val cols = Seq("name" -> "String", "type" -> "String")
            sendDataBlock(out, rev, MiniChSelect.encodeNative(cols,
              structure.map { case (n, t) => Map[String, Any]("name" -> n, "type" -> t) }),
              compress)
            wVarint(out, 5L) // EndOfStream
            out.flush()
            return true
        }
      case None => ()
    }

    if (query.trim.toUpperCase.startsWith("SELECT")) {
      try {
        http.evalSelect(query.trim.replaceAll("(?is)\\s+FORMAT\\s+Native\\s*$", ""),
          lastSettings) match {
          case None =>
            sendException(out, 62, s"Syntax error: unsupported SELECT shape: ${query.take(60)}")
            return false
          case Some((colTypes, rows)) =>
            // real-server framing: a zero-row structure block first, then
            // data split at max_block_size rows per Data packet; LC
            // columns dictionary-encoded unless the setting converts them
            val lcNative = !lastSettings.get("low_cardinality_allow_in_native_format")
              .exists(v => v == "0" || v.equalsIgnoreCase("false"))
            sendDataBlock(out, rev, MiniChSelect.encodeNative(colTypes, Nil, lcNative),
              compress)
            val blockRows = lastSettings.get("max_block_size")
              .flatMap(_.toIntOption).filter(_ > 0).getOrElse(65409)
            rows.grouped(blockRows).foreach { g =>
              sendDataBlock(out, rev, MiniChSelect.encodeNative(colTypes, g, lcNative),
                compress)
            }
            wVarint(out, 5L) // EndOfStream
            out.flush()
            return true
        }
      } catch {
        case CHFault(code, msg) => sendException(out, code, msg); return false
      }
    }

    val ins = """(?is)INSERT\s+INTO\s+(\S+?)\.(\S+?)\s*\(([^)]*)\)\s*(?:FORMAT\s+\w+)?\s*$""".r
    ins.findFirstMatchIn(query.trim) match {
      case None =>
        sendException(out, 62, s"Syntax error: failed at position 1: ${query.take(60)}")
        false
      case Some(m) =>
        http.noteInsertAttempt()
        val db = unq(m.group(1)); val tbl = unq(m.group(2))
        val cols = m.group(3).split(",").map(s => unq(s.trim)).toSeq
        http.columnsOf(db, tbl) match {
          case None =>
            sendException(out, 60, s"Table $db.$tbl does not exist")
            false
          case Some(structure) =>
            val missing = cols.filterNot(c => structure.exists(_._1 == c))
            if (missing.nonEmpty) {
              sendException(out, 16, s"No such column ${missing.head} in table $db.$tbl")
              return false
            }
            // the server answers an INSERT with a zero-row structure block
            sendStructureBlock(out, rev, structure.filter(c => cols.contains(c._1)),
              compress)
            readDataStream(in, out, rev, db, tbl, cols, compress)
        }
    }
  }

  /** Run a block read (info + payload walk) against the right stream:
    * the raw socket, or a fixture-side decompressing frame reader whose
    * content the block must consume EXACTLY. */
  private def inBlock[A](in: InputStream, compress: Boolean)(f: InputStream => A): A =
    if (!compress) f(in)
    else {
      val r = new FxFrames.Reader(in)
      val a = f(r)
      if (r.leftover > 0)
        throw new java.io.IOException(
          s"client frame spans block boundary (${r.leftover} leftover bytes)")
      a
    }

  /** The codec this server answers WITH — like a real server it follows
    * its (per-query-settable) network_compression_method, independent of
    * whatever codec the client's frames used. */
  private def responseMethod: Int =
    if (lastSettings.get("network_compression_method")
        .exists(_.equalsIgnoreCase("zstd"))) 0x90
    else 0x82

  /** Write one block BODY (info + columns), plain or framed. */
  private def writeBlockBody(out: OutputStream, rev: Long, body: Array[Byte],
                             compress: Boolean): Unit =
    if (compress) {
      val raw = new java.io.ByteArrayOutputStream(body.length + 16)
      writeBlockInfo(raw, rev)
      raw.write(body, 0, body.length)
      val corrupt = corruptNextCompressedFrame
      corruptNextCompressedFrame = false
      FxFrames.write(raw.toByteArray, out, corrupt, responseMethod)
    } else {
      writeBlockInfo(out, rev)
      out.write(body, 0, body.length)
    }

  private def sendDataBlock(out: OutputStream, rev: Long, body: Array[Byte],
                            compress: Boolean): Unit = {
    wVarint(out, 1L) // server Data packet
    if (rev >= 50264) wStr(out, "")
    writeBlockBody(out, rev, body, compress)
  }

  /** Consume the client's Data packets until the empty terminal block;
    * decode+validate+store each via the shared brain. EndOfStream on
    * success; Exception + close on the first fault (real-server INSERT
    * semantics: already-received blocks stay committed). */
  private def readDataStream(in: InputStream, out: OutputStream, rev: Long,
                             db: String, tbl: String, cols: Seq[String],
                             compress: Boolean): Boolean = {
    var done = false
    while (!done) {
      rVarint(in) match {
        case 2L /* Data */ =>
          if (rev >= 50264) rStr(in) // external table name
          inBlock(in, compress) { bin =>
            readBlockInfo(bin, rev)
            readBlockPayload(bin)
          } match {
            case None => done = true // 0×0 terminal block
            case Some(payload) =>
              http.pollInjectedFault() match {
                case Some((code, msg)) =>
                  sendException(out, code, msg); return false
                case None =>
                  try http.insertNativeBlock(db, tbl, cols, payload)
                  catch {
                    case CHFault(code, msg) =>
                      sendException(out, code, msg); return false
                  }
              }
          }
        case 3L /* Cancel */ => return false
        case other =>
          sendException(out, 101, s"Unexpected packet $other during INSERT")
          return false
      }
    }
    if (sendLogBlockOnInsert) {
      // a Log packet is an ordinary Data block on packet code 10 — two
      // columns, two rows, exercising both fixed-width and string skips.
      // ALWAYS plain, even when the session negotiated compression: a
      // real server writes Log (and ProfileEvents) blocks to the
      // uncompressed stream — only Data/Totals/Extremes ride the
      // compressed channel — so the fixture matching that split is what
      // lets the round-trip test catch a client that wrongly frames them
      wVarint(out, 10L)
      wStr(out, "")
      writeBlockBody(out, rev, MiniChSelect.encodeNative(
        Seq("event_time" -> "DateTime", "text" -> "String"),
        Seq(Map("event_time" -> 1700000000000000L,
            "text" -> "MemoryTracker: peak 1.00 GiB"),
          Map("event_time" -> 1700000001000000L,
            "text" -> "executeQuery: read 4 rows"))), compress = false)
    }
    wVarint(out, 5L) // EndOfStream
    out.flush()
    true
  }

  /** Capture exactly one block's bytes off the socket. A Native block is
    * not length-prefixed — its extent is only knowable by walking the
    * column data with the declared types — so the fixture walks the block
    * structurally (types parsed, offsets followed, per-width skips)
    * through a tee that records every byte consumed, then replays the
    * captured bytes into the shared validator for the value-level pass.
    * Returns None for the 0×0 terminal block. */
  private def readBlockPayload(in: InputStream): Option[Array[Byte]] = {
    // tee everything consumed while skeleton-decoding the block, so the
    // exact block bytes can be replayed into the shared validator
    val buf = new java.io.ByteArrayOutputStream(1 << 16)
    val tee = new InputStream {
      def read(): Int = { val b = in.read(); if (b >= 0) buf.write(b); b }
      override def read(a: Array[Byte], off: Int, len: Int): Int = {
        val k = in.read(a, off, len)
        if (k > 0) buf.write(a, off, k)
        k
      }
    }
    val ncols = rVarint(tee)
    val nrows = rVarint(tee)
    if (ncols == 0 && nrows == 0) return None
    (0L until ncols).foreach { _ =>
      rStr(tee) // column name
      val typeText = rStr(tee)
      val t =
        try graft.types.CHType.parse(typeText)
        catch { case _: Exception =>
          throw CHFault(50, s"Unknown data type in Native block: $typeText") }
      skipColumnData(tee, t, nrows.toInt)
    }
    Some(buf.toByteArray)
  }

  /** Advance the stream past one column's data (structure-only walk; value
    * validation happens in the shared brain's second pass). */
  private def skipColumnData(in: InputStream, t: graft.types.CHType, n: Int): Unit = {
    import graft.types.CHType._
    t match {
      // LC-declared data is dictionary-encoded on the wire (our own
      // client always converts LC to the inner type on INSERT, but a
      // hand-crafted block must still walk correctly, never misframe)
      case CHLowCardinality(inner) =>
        if (n > 0) {
          val version = rI64(in)
          if (version != 1L) throw CHFault(50, s"LC keys version $version unsupported")
          val flags = rI64(in)
          val keyBytes = (flags & 0xffL).toInt match {
            case 0 => 1; case 1 => 2; case 2 => 4; case 3 => 8
            case w => throw CHFault(50, s"LC key width code $w unsupported")
          }
          val base = inner match { case CHNullable(i) => i; case o => o }
          val dictSize = rI64(in)
          skipColumnData(in, base, dictSize.toInt)
          rI64(in) // keys count
          skipBytes(in, n.toLong * keyBytes)
        }
      case CHNullable(inner) =>
        skipBytes(in, n) // null mask
        skipColumnData(in, inner, n)
      case CHArray(inner) =>
        val offs = (0 until n).map(_ => rI64(in))
        skipColumnData(in, inner, if (n == 0) 0 else offs.last.toInt)
      case CHMap(_, vt) =>
        val offs = (0 until n).map(_ => rI64(in))
        val total = if (n == 0) 0 else offs.last.toInt
        (0 until total).foreach(_ => skipString(in))
        skipColumnData(in, vt, total)
      case CHTuple(elems) =>
        elems.foreach(e => skipColumnData(in, e._2, n))
      case CHString =>
        (0 until n).foreach(_ => skipString(in))
      case CHFixedString(w) => skipBytes(in, n * w)
      case CHBool | CHInt(8) | CHUInt(8) | CHEnum(8, _) => skipBytes(in, n)
      case CHInt(16) | CHUInt(16) | CHEnum(16, _) | CHDate => skipBytes(in, 2 * n)
      case CHInt(32) | CHUInt(32) | CHFloat32 | CHDateTime(_) | CHDate32 | CHIPv4 =>
        skipBytes(in, 4 * n)
      case CHInt(_) | CHUInt(_) | CHFloat64 | CHDateTime64(_, _) => skipBytes(in, 8 * n)
      case CHDecimal(p, _) =>
        skipBytes(in, n * (if (p <= 9) 4 else if (p <= 18) 8 else 16))
      case CHUUID | CHIPv6 => skipBytes(in, 16L * n)
    }
  }

  private def skipString(in: InputStream): Unit = skipBytes(in, rVarint(in).toInt)

  private def skipBytes(in: InputStream, n0: Long): Unit = {
    var n = n0
    val tmp = new Array[Byte](math.min(n, 1 << 16).toInt max 1)
    while (n > 0) {
      val k = in.read(tmp, 0, math.min(n, tmp.length.toLong).toInt)
      if (k < 0) throw new java.io.EOFException("connection closed mid-block")
      n -= k
    }
  }

  private def sendStructureBlock(out: OutputStream, rev: Long,
                                 cols: Seq[(String, String)],
                                 compress: Boolean): Unit = {
    val body = new java.io.ByteArrayOutputStream(64)
    wVarint(body, cols.length.toLong)
    wVarint(body, 0L) // zero rows: structure only
    cols.foreach { case (n, t) => wStr(body, n); wStr(body, t) }
    sendDataBlock(out, rev, body.toByteArray, compress)
    out.flush()
  }

  private def sendException(out: OutputStream, code: Int, msg: String): Unit = {
    wVarint(out, 2L) // server Exception packet
    wI32(out, code)
    wStr(out, "DB::Exception")
    wStr(out, s"DB::Exception: $msg")
    wStr(out, "") // stack trace
    out.write(0) // no nested
    out.flush()
  }

  private def unq(id: String): String = {
    val t = id.trim
    if (t.length >= 2 && t.head == '`' && t.last == '`')
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

}

object MiniClickHouseTcpServer {
  /** FIXTURE-SIDE compressed-frame codec — deliberately a SECOND
    * implementation of the frame layout (header offsets,
    * size-includes-header, checksum coverage), separate from the
    * production [[ChCompression]], so a framing mistake on either side
    * cannot round-trip invisibly. Only the [[CityHash102]] hash itself is
    * shared (single implementation; its validation note applies).
    * Fixture frames carry at most 64 KiB raw so ordinary-sized tests
    * exercise MULTI-frame blocks, not just single-frame ones.
    * private[sink] so the cross-codec property fuzz (ChCompressionSpec)
    * can drive production-compress → fixture-decode and vice versa. */
  private[sink] object FxFrames {
    import MiniClickHouseServer.CHFault
    private val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()
    private val FrameRaw = 64 * 1024

    def write(raw: Array[Byte], out: OutputStream, corruptFirst: Boolean,
              method: Int = 0x82): Unit = {
      var off = 0
      var first = true
      do {
        val n = math.min(FrameRaw, raw.length - off)
        val (frame, cn) = method match {
          case 0x82 =>
            val comp = lz4.fastCompressor()
            val f = new Array[Byte](9 + comp.maxCompressedLength(math.max(n, 1)))
            (f, comp.compress(raw, off, n, f, 9, f.length - 9))
          case 0x90 =>
            val max = com.github.luben.zstd.Zstd.compressBound(n.toLong).toInt
            val f = new Array[Byte](9 + math.max(max, 1))
            val k = com.github.luben.zstd.Zstd.compressByteArray(
              f, 9, f.length - 9, raw, off, n, 1)
            if (com.github.luben.zstd.Zstd.isError(k))
              throw new java.io.IOException("fixture zstd compress failed")
            (f, k.toInt)
          case m => throw new IllegalArgumentException(f"fixture method 0x$m%02x")
        }
        frame(0) = method.toByte
        wle32(frame, 1, cn + 9)
        wle32(frame, 5, n)
        val (lo, hi) = CityHash102.cityHash128(frame, 0, cn + 9)
        val sum = new Array[Byte](16)
        wle64(sum, 0, lo); wle64(sum, 8, hi)
        out.write(sum)
        // flip one payload byte AFTER the checksum was computed: the
        // client must detect the mismatch, never surface garbage
        if (corruptFirst && first && cn > 0) frame(9) = (frame(9) ^ 0x5a).toByte
        first = false
        out.write(frame, 0, cn + 9)
        off += n
      } while (off < raw.length)
    }

    /** Lazily-decompressing stream over client frames; `leftover` lets
      * the block walk assert exact consumption. */
    final class Reader(in: InputStream) extends InputStream {
      private var buf: Array[Byte] = Array.emptyByteArray
      private var pos = 0
      def leftover: Int = buf.length - pos

      private def fill(): Boolean = {
        val head = new Array[Byte](25)
        var got = 0
        while (got < head.length) {
          val k = in.read(head, got, head.length - got)
          if (k < 0) {
            if (got == 0) return false
            throw new java.io.EOFException("truncated client frame header")
          }
          got += k
        }
        val method = head(16) & 0xff
        val csize = rle32(head, 17)
        val rsize = rle32(head, 21)
        if (csize < 9 || csize > (1 << 30) || rsize < 0 || rsize > (1 << 30))
          throw CHFault(89, s"Checksum doesn't match: implausible frame sizes $csize/$rsize")
        val frame = new Array[Byte](csize)
        System.arraycopy(head, 16, frame, 0, 9)
        var o = 9
        while (o < csize) {
          val k = in.read(frame, o, csize - o)
          if (k < 0) throw new java.io.EOFException("truncated client frame body")
          o += k
        }
        val (lo, hi) = CityHash102.cityHash128(frame, 0, csize)
        if (lo != rle64(head, 0) || hi != rle64(head, 8))
          throw CHFault(89, "Checksum doesn't match: corrupted data received")
        buf = method match {
          case 0x82 =>
            val outBuf = new Array[Byte](rsize)
            val n = lz4.safeDecompressor().decompress(frame, 9, csize - 9, outBuf, 0)
            if (n != rsize)
              throw CHFault(271, s"Cannot decompress: got $n bytes, expected $rsize")
            outBuf
          case 0x90 =>
            // a client configured with network_compression_method=zstd
            // sends 0x90 frames; a real server accepts them like its own
            val outBuf = new Array[Byte](rsize)
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              outBuf, 0, rsize, frame, 9, csize - 9)
            if (com.github.luben.zstd.Zstd.isError(n) || n != rsize)
              throw CHFault(271, s"Cannot decompress zstd: got $n, expected $rsize")
            outBuf
          case 0x02 => java.util.Arrays.copyOfRange(frame, 9, csize)
          case m => throw CHFault(432, f"Unknown codec method byte 0x$m%02x")
        }
        pos = 0
        true
      }

      override def read(): Int = {
        while (pos >= buf.length) if (!fill()) return -1
        val b = buf(pos) & 0xff
        pos += 1
        b
      }
      override def read(a: Array[Byte], off: Int, len: Int): Int = {
        if (len == 0) return 0
        while (pos >= buf.length) if (!fill()) return -1
        val n = math.min(len, buf.length - pos)
        System.arraycopy(buf, pos, a, off, n)
        pos += n
        n
      }
    }

    private def wle32(a: Array[Byte], off: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { a(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    private def wle64(a: Array[Byte], off: Int, v: Long): Unit = {
      var i = 0
      while (i < 8) { a(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    private def rle32(a: Array[Byte], off: Int): Int = {
      var v = 0
      var i = 0
      while (i < 4) { v |= (a(off + i) & 0xff) << (8 * i); i += 1 }
      v
    }
    private def rle64(a: Array[Byte], off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (a(off + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
  }
}
