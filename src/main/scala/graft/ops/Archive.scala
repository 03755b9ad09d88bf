package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Archive operators — SURVEY §2.4 (ManipulateArchive, Focus/Unfocus
 * ArchiveEntry, extensions/libarchive/ManipulateArchive.cpp,
 * FocusArchiveEntry.cpp:241) and the MergeContent TAR/ZIP formats
 * (MergeContent.h:293-331).
 *
 * Binary UDFs over java.util.zip: zip entries carry a fixed timestamp so
 * packed bytes are deterministic (hashable across runs/engines).
 */
object Archive {

  /** Pack (name, payload) into a single-entry zip. */
  val zipPackUdf = udf((name: String, payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      val e = new ZipEntry(name)
      e.setTime(0L) // deterministic bytes
      z.putNextEntry(e); z.write(payload); z.closeEntry(); z.close()
      bos.toByteArray
    })

  /** FocusArchiveEntry: extract the named entry's payload (null if absent). */
  // every reader below is TOTAL: a malformed archive yields null (callers
  // route `failure`, ManipulateArchive.cpp error relationship) — never a
  // task-killing ZipException/IOException mid-scan
  val zipFocusUdf = udf((archive: Array[Byte], name: String) =>
    if (archive == null) null
    else try {
      val z = new ZipInputStream(new java.io.ByteArrayInputStream(archive))
      var e = z.getNextEntry
      var found: Array[Byte] = null
      while (e != null && found == null) {
        if (e.getName == name) found = z.readAllBytes()
        e = z.getNextEntry
      }
      found
    } catch { case scala.util.control.NonFatal(_) => null })

  /** List entry names (ManipulateArchive inspection). */
  val zipEntriesUdf = udf((archive: Array[Byte]) =>
    if (archive == null) null
    else try {
      val z = new ZipInputStream(new java.io.ByteArrayInputStream(archive))
      val names = Seq.newBuilder[String]
      var e = z.getNextEntry
      while (e != null) { names += e.getName; e = z.getNextEntry }
      names.result()
    } catch { case scala.util.control.NonFatal(_) => null })

  /** UnfocusArchiveEntry (extensions/libarchive/UnfocusArchiveEntry.cpp):
    * write the (possibly modified) focused entry's content back into the
    * archive under its name, preserving every other entry and the entry
    * ORDER. Null when the archive is malformed or the entry is absent
    * (the reference's error route — unfocus without a focused entry). */
  val zipUnfocusUdf = udf((archive: Array[Byte], name: String,
                           newContent: Array[Byte]) =>
    if (archive == null || newContent == null) null
    else try {
      val z = new ZipInputStream(new java.io.ByteArrayInputStream(archive))
      val bos = new ByteArrayOutputStream()
      val out = new ZipOutputStream(bos)
      var found = false
      var e = z.getNextEntry
      while (e != null) {
        val ne = new ZipEntry(e.getName)
        ne.setTime(0L)
        out.putNextEntry(ne)
        if (e.getName == name) { found = true; out.write(newContent) }
        else out.write(z.readAllBytes())
        out.closeEntry()
        e = z.getNextEntry
      }
      out.close()
      if (found) bos.toByteArray else null
    } catch { case scala.util.control.NonFatal(_) => null })

  def zipPack(name: Column, payload: Column): Column =
    zipPackUdf(name, payload.cast("binary"))
  def zipFocus(archive: Column, name: Column): Column = zipFocusUdf(archive, name)
  def zipUnfocus(archive: Column, name: Column, newContent: Column): Column =
    zipUnfocusUdf(archive, name, newContent.cast("binary"))
  def zipEntries(archive: Column): Column = zipEntriesUdf(archive)

  // --- TAR format (MergeContent.h:293-331 MERGE_FORMAT_TAR_VALUE) ---

  import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}

  /** Pack (name, payload) into a single-entry tar; fixed mtime for
    * deterministic bytes. */
  val tarPackUdf = udf((name: String, payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val bos = new ByteArrayOutputStream()
      val t = new TarArchiveOutputStream(bos)
      val e = new TarArchiveEntry(name)
      e.setSize(payload.length)
      e.setModTime(0L) // deterministic bytes
      t.putArchiveEntry(e); t.write(payload); t.closeArchiveEntry(); t.close()
      bos.toByteArray
    })

  val tarFocusUdf = udf((archive: Array[Byte], name: String) =>
    if (archive == null) null
    else try {
      val t = new TarArchiveInputStream(new java.io.ByteArrayInputStream(archive))
      var e = t.getNextEntry
      var found: Array[Byte] = null
      while (e != null && found == null) {
        if (e.getName == name) found = t.readAllBytes()
        e = t.getNextEntry
      }
      found
    } catch { case scala.util.control.NonFatal(_) => null })

  val tarEntriesUdf = udf((archive: Array[Byte]) =>
    if (archive == null) null
    else try {
      val t = new TarArchiveInputStream(new java.io.ByteArrayInputStream(archive))
      val names = Seq.newBuilder[String]
      var e = t.getNextEntry
      while (e != null) { names += e.getName; e = t.getNextEntry }
      names.result()
    } catch { case scala.util.control.NonFatal(_) => null })

  /** Tar UnfocusArchiveEntry write-back — same contract as the zip form
    * (the reference's libarchive focus/unfocus is format-agnostic). */
  val tarUnfocusUdf = udf((archive: Array[Byte], name: String,
                           newContent: Array[Byte]) =>
    if (archive == null || newContent == null) null
    else try {
      val in = new TarArchiveInputStream(
        new java.io.ByteArrayInputStream(archive))
      val bos = new ByteArrayOutputStream()
      val out = new TarArchiveOutputStream(bos)
      var found = false
      var e = in.getNextEntry
      while (e != null) {
        val payload =
          if (e.getName == name) { found = true; newContent }
          else in.readAllBytes()
        val ne = new TarArchiveEntry(e.getName)
        ne.setSize(payload.length)
        ne.setModTime(0L)
        out.putArchiveEntry(ne); out.write(payload); out.closeArchiveEntry()
        e = in.getNextEntry
      }
      out.close()
      if (found) bos.toByteArray else null
    } catch { case scala.util.control.NonFatal(_) => null })

  /** First entry's payload of a tar archive, null when the bytes are not a
    * readable tar (CompressContent decompress with Encapsulate in TAR:
    * ReadArchiveStream::nextEntry failure routes the original to failure,
    * CompressContent.cpp:146-153). */
  val tarFirstUdf = udf((archive: Array[Byte]) =>
    if (archive == null) null
    else try {
      val t = new TarArchiveInputStream(new java.io.ByteArrayInputStream(archive))
      val e = t.getNextEntry
      if (e == null) null else t.readAllBytes()
    } catch { case scala.util.control.NonFatal(_) => null })

  def tarPack(name: Column, payload: Column): Column =
    tarPackUdf(name, payload.cast("binary"))
  def tarFocus(archive: Column, name: Column): Column = tarFocusUdf(archive, name)
  def tarUnfocus(archive: Column, name: Column, newContent: Column): Column =
    tarUnfocusUdf(archive, name, newContent.cast("binary"))
  def tarEntries(archive: Column): Column = tarEntriesUdf(archive)
  def tarFirst(archive: Column): Column = tarFirstUdf(archive)

  // --- multi-entry packing: MergeContent's TAR/ZIP merge formats pack a
  // whole bin of FlowFiles into one archive (MergeContent.h:293-331);
  // feed with array_sort(collect_list(struct(name, payload))) per bin ---

  val zipPackMultiUdf = udf((names: Seq[String], payloads: Seq[Array[Byte]]) =>
    if (names == null || payloads == null) null
    else {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      names.lazyZip(payloads).foreach { (name, payload) =>
        val e = new ZipEntry(name)
        e.setTime(0L)
        z.putNextEntry(e); z.write(payload); z.closeEntry()
      }
      z.close()
      bos.toByteArray
    })

  val tarPackMultiUdf = udf((names: Seq[String], payloads: Seq[Array[Byte]]) =>
    if (names == null || payloads == null) null
    else {
      val bos = new ByteArrayOutputStream()
      val t = new TarArchiveOutputStream(bos)
      names.lazyZip(payloads).foreach { (name, payload) =>
        val e = new TarArchiveEntry(name)
        e.setSize(payload.length)
        e.setModTime(0L)
        t.putArchiveEntry(e); t.write(payload); t.closeArchiveEntry()
      }
      t.close()
      bos.toByteArray
    })

  /** Tar multi-pack honoring the reference's per-entry mode contract
    * (MergeContent.h:214-230): default S_IFREG|0755; a parseable
    * `tar.permissions` attribute overrides the permission bits via a
    * DECIMAL std::stoi parse (the reference quirk: "644" means 644₁₀).
    * Unparseable values fall back to the default, as the reference's
    * catch(...) does. */
  val tarPackMultiPermsUdf = udf(
    (names: Seq[String], payloads: Seq[Array[Byte]], perms: Seq[String]) =>
    if (names == null || payloads == null) null
    else {
      val bos = new ByteArrayOutputStream()
      val t = new TarArchiveOutputStream(bos)
      names.indices.foreach { i =>
        val e = new TarArchiveEntry(names(i))
        val payload = payloads(i)
        e.setSize(payload.length)
        e.setModTime(0L)
        val perm = if (perms == null || i >= perms.size) null else perms(i)
        // std::stoi semantics (MergeContent.h:223): skip leading whitespace,
        // accept an optional sign, parse the longest decimal digit prefix,
        // ignore trailing junk; throw (→ default) only when no digits lead.
        val mode = Option(perm)
          .map(s => "^\\s*[+-]?\\d+".r.findFirstIn(s).getOrElse(""))
          .map(_.trim).filter(_.nonEmpty).flatMap(_.toIntOption)
          .map(p => 0x8000 | p).getOrElse(0x8000 | 0x1ed) // S_IFREG | 0755
        e.setMode(mode)
        t.putArchiveEntry(e); t.write(payload); t.closeArchiveEntry()
      }
      t.close()
      bos.toByteArray
    })

  def zipPackMulti(names: Column, payloads: Column): Column =
    zipPackMultiUdf(names, payloads)
  def tarPackMulti(names: Column, payloads: Column): Column =
    tarPackMultiUdf(names, payloads)
  def tarPackMultiPerms(names: Column, payloads: Column, perms: Column): Column =
    tarPackMultiPermsUdf(names, payloads, perms)

  // --- ManipulateArchive in-place entry edit (ManipulateArchive.cpp:96-190):
  // touch/remove/copy/move on a zip's entry list without splitting the
  // archive. Failure routing mirrors the reference: missing target (except
  // touch) → failure; existing destination → failure. before/after position
  // the new entry; a missing anchor appends to the end
  // (ManipulateArchive.cpp:135-155). Touched entries are empty with fixed
  // mtime 0 (the reference stamps time(nullptr); fixed here for
  // deterministic bytes, consistent with the pack UDFs). ---

  val zipManipulateUdf = udf((archive: Array[Byte], operation: String,
                              target: String, destination: String,
                              before: String, after: String) => {
    if (archive == null) (null: Array[Byte], "failure")
    else try {
      val z = new ZipInputStream(new java.io.ByteArrayInputStream(archive))
      val entries = scala.collection.mutable.ListBuffer.empty[(String, Array[Byte])]
      var e = z.getNextEntry
      while (e != null) { entries += ((e.getName, z.readAllBytes())); e = z.getNextEntry }
      val op = if (operation == null) "" else operation.toLowerCase
      val tgtIdx = entries.indexWhere(_._1 == target)
      val destSet = destination != null && destination.nonEmpty
      if (tgtIdx < 0 && op != "touch") (null, "failure")
      else if (destSet && entries.exists(_._1 == destination)) (null, "failure")
      else {
        // insertion point: before/after anchor in the ORIGINAL list; a
        // missing anchor appends (reference warns + appends)
        val anchor = if (after != null && after.nonEmpty) after
                     else if (before != null && before.nonEmpty) before else ""
        val isAfter = after != null && after.nonEmpty
        def insertIdx(buf: scala.collection.mutable.ListBuffer[(String, Array[Byte])]): Int = {
          if (anchor.isEmpty) buf.length
          else {
            val i = buf.indexWhere(_._1 == anchor)
            if (i < 0) buf.length else if (isAfter) i + 1 else i
          }
        }
        val applied = op match {
          case "remove" => entries.remove(tgtIdx); true
          case "copy"   =>
            val payload = entries(tgtIdx)._2
            entries.insert(insertIdx(entries), (destination, payload)); true
          case "move"   =>
            val payload = entries(tgtIdx)._2
            entries.remove(tgtIdx)
            entries.insert(insertIdx(entries), (destination, payload)); true
          case "touch"  =>
            entries.insert(insertIdx(entries), (destination, Array.emptyByteArray)); true
          case _ => false // invalid op = config error
        }
        if (!applied) (null, "failure")
        else {
          val bos = new ByteArrayOutputStream()
          val zo = new ZipOutputStream(bos)
          entries.foreach { case (name, payload) =>
            val en = new ZipEntry(name)
            en.setTime(0L)
            zo.putNextEntry(en); zo.write(payload); zo.closeEntry()
          }
          zo.close()
          (bos.toByteArray, "success")
        }
      }
    } catch { case scala.util.control.NonFatal(_) => (null: Array[Byte], "failure") }
  })

  /** ManipulateArchive: returns struct(result BINARY, relationship STRING). */
  def zipManipulate(archive: Column, operation: Column, target: Column,
                    destination: Column, before: Column, after: Column): Column =
    zipManipulateUdf(archive, operation, target, destination, before, after)
}
