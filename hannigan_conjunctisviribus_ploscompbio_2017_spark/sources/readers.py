"""Typed sources for the reference's interchange formats (SURVEY §2.1).

Everything tabular goes through spark.read.csv with explicit schemas
(S1/S2/S5/S12); the bioinformatics flat formats (FASTA/FASTQ, pilerCR,
EMBL, GenBank) are line-stateful and parse via mapPartitions over
spark.read.text — per-partition imperative parsing is the one legitimate
RDD-adjacent spot in the engine (SURVEY §2.13), and files are split by
record boundary using wholeTextFiles only when records can span partition
splits.

Citations are to /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hannigan_conjunctisviribus_ploscompbio_2017_spark import schemas as S

# --- S1/S2: delimited text -------------------------------------------------


def read_tsv(spark: SparkSession, path: str, schema: T.StructType, header: bool = False) -> DataFrame:
    """S1 — headerless TSV (the reference's universal interchange;
    bin/CollapseContigCounts.R:27)."""
    return spark.read.csv(path, sep="\t", schema=schema, header=header)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = False) -> DataFrame:
    """S2 — CSV (CONCOCT cluster maps; bin/collapseLength.R:39-43)."""
    return spark.read.csv(path, sep=",", schema=schema, header=header)


def write_tsv(df: DataFrame, path: str, header: bool = False) -> None:
    """S12 — TSV sink (write.table(quote=F, sep='\\t'),
    bin/CollapseGeneScores.R:40-46)."""
    df.write.mode("overwrite").option("header", header).csv(path, sep="\t")


def read_metadata(spark: SparkSession, path: str) -> DataFrame:
    """16-col sample metadata with header (consumed positionally at
    bin/Metadata2graph.pl:95-110)."""
    return spark.read.csv(path, sep="\t", schema=S.METADATA, header=True)


def read_blast6(spark: SparkSession, path: str) -> DataFrame:
    """BLAST outfmt-6 (bin/GetProphagesByBlast.sh:39-51)."""
    return spark.read.csv(path, sep="\t", schema=S.BLAST6)


# --- S5: SAM → per-contig counts --------------------------------------------


def sam_contig_counts(spark: SparkSession, path: str) -> DataFrame:
    """S5 — skip @ headers, count alignments per reference contig
    (bin/calculate_abundance_from_sam.pl:25-38): pure filter+groupBy."""
    lines = spark.read.text(path)
    fields = F.split(F.col("value"), "\t")
    return (
        lines.filter(~F.col("value").startswith("@"))
        .select(fields.getItem(2).alias("contig"))
        .filter(F.col("contig") != "*")
        .groupBy("contig")
        .agg(F.count(F.lit(1)).alias("count"))
    )


# --- S3: FASTA --------------------------------------------------------------

FASTA_SCHEMA = "id string, seq string"


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """S3 — FASTA → (id, seq), multi-line records supported
    (bin/ContigLengthTable.pl:43-57 dies on malformed leading sequence;
    we drop pre-header garbage).

    Parses per file via mapPartitions over wholeTextFiles-style binary
    read: FASTA records can span text-partition boundaries, so the unit
    of parallelism is the file (fine: assemblies come as many per-sample
    files; a single multi-TB FASTA should be pre-chunked upstream).
    """
    files = spark.sparkContext.wholeTextFiles(path)

    def parse(kv):
        _, content = kv
        name, chunks = None, []
        for line in content.splitlines():
            if line.startswith(">"):
                if name is not None:
                    yield (name, "".join(chunks))
                # bare '>' (nameless header) -> empty id, matching
                # read_fasta_parallel; [0]-indexing the empty split
                # would crash the task instead
                fields = line[1:].split()
                name = fields[0] if fields else ""
                chunks = []
            elif name is not None:
                chunks.append(line.strip())
        if name is not None:
            yield (name, "".join(chunks))

    return files.flatMap(parse).toDF(FASTA_SCHEMA)


def fasta_lengths(fasta: DataFrame) -> DataFrame:
    """S3b — (id, length) table (bin/contigstats.sh:25-29)."""
    return fasta.select("id", F.length("seq").cast("long").alias("length"))


def length_filter(fasta: DataFrame, lo: int = 20, hi: int = 65) -> DataFrame:
    """P7 — spacer length window (bin/LengthFilterSeqs.pl:44-61)."""
    return fasta.filter(F.length("seq").between(lo, hi))


# --- S4: FASTQ pair intersection ---------------------------------------------


def read_fastq_ids(spark: SparkSession, path: str) -> DataFrame:
    """S4a — read ids from FASTQ (line index % 4 == 0).

    monotonically_increasing_id is only contiguous within a partition and
    FASTQ's 4-line frame breaks across partition splits → single-partition
    read per file (FASTQ at scale arrives pre-split per sample, so the
    parallel unit is the file, like FASTA)."""
    lines = spark.read.text(path).coalesce(1).withColumn(
        "_idx", F.monotonically_increasing_id()
    )
    return (
        lines.filter(F.col("_idx") % 4 == 0)
        .select(F.regexp_extract("value", r"^@(\S+)", 1).alias("read_id"))
    )


def paired_reads(r1_ids: DataFrame, r2_ids: DataFrame) -> DataFrame:
    """S4b — keep reads present in both mates (set-intersection join,
    bin/get_trimmed_pairs.py:7-35)."""
    return r1_ids.join(r2_ids, "read_id", "inner").select("read_id").distinct()


# --- chunk-aligned splitters: parallelism WITHIN one huge file ---------------
#
# read_fasta/read_fastq_ids parallelize per file (the norm for per-sample
# sequencing data).  For the one-multi-TB-file case these splitters plan
# fixed-size byte chunks on the driver (a filesystem listing, no data
# read) and align each chunk to the next record boundary executor-side —
# the Hadoop FASTQ-input-format design.  Contract: a record belongs to
# the chunk containing its header's first byte, so chunks parse
# disjointly and exhaustively with no cross-task coordination.  Requires
# a filesystem every executor can open (local/NFS/fuse mount).


def _chunk_plan(spark: SparkSession, path: str, chunk_bytes: int) -> DataFrame:
    import glob as _glob
    import os as _os

    paths = sorted(_glob.glob(path)) if any(ch in path for ch in "*?[") else [path]
    files = []
    for p in paths:
        if _os.path.isdir(p):
            files += sorted(
                _os.path.join(p, f)
                for f in _os.listdir(p)
                if _os.path.isfile(_os.path.join(p, f))
            )
        else:
            files.append(p)
    chunks = []
    for f in files:
        size = _os.path.getsize(f)
        for start in range(0, max(size, 1), chunk_bytes):
            chunks.append((f, start, min(start + chunk_bytes, size)))
    return spark.createDataFrame(chunks, "file string, start long, end long").repartition(
        max(len(chunks), 1)
    )


def _fastq_align(buf: bytes, line_starts: list[int]) -> int | None:
    """Index into line_starts of the first true FASTQ record header.

    A quality line may start with '@', so '@' alone is ambiguous; the
    standard disambiguation (Hadoop-BAM's FastqInputFormat): candidate
    line i is a header iff it starts with '@' and line i+2 starts with
    '+'. Both can't hold for a quality line and its +2 (a sequence
    line never starts with '+')."""
    for i in range(len(line_starts) - 2):
        if buf[line_starts[i] : line_starts[i] + 1] == b"@" and (
            buf[line_starts[i + 2] : line_starts[i + 2] + 1] == b"+"
        ):
            return i
    return None


def _open_at(fh, start: int) -> bool:
    """Seek to `start`; True iff file-offset `start` begins a line (start
    of file, or the previous byte is a newline — the exact-boundary case
    a find('\\n') scan inside the chunk cannot see)."""
    if start == 0:
        fh.seek(0)
        return True
    fh.seek(start - 1)
    at_line = fh.read(1) == b"\n"
    return at_line


def read_fastq_parallel(
    spark: SparkSession, path: str, chunk_mb: int = 64, chunk_bytes: int | None = None
) -> DataFrame:
    """S4a at single-file scale: (read_id, seq, qual) with one task per
    chunk_mb byte range — no coalesce(1) ceiling. Ownership contract: a
    record belongs to the chunk containing its header's first byte; the
    owning task reads past its end to complete the record, so chunks
    parse disjointly and exhaustively."""
    chunk_bytes = chunk_bytes or chunk_mb * 1024 * 1024

    def parse(it):
        import pandas as pd

        for pdf in it:
            out_id, out_seq, out_qual = [], [], []
            for f, start, end in zip(pdf["file"], pdf["start"], pdf["end"]):
                with open(f, "rb") as fh:
                    boundary_is_line_start = _open_at(fh, int(start))
                    need = int(end) - int(start)
                    slack = 1 << 20
                    buf = fh.read(need + slack)
                    # a record owned just before `end` needs ≤5 newlines
                    # past `end` to complete (partial line + 4 record lines)
                    while buf[need:].count(b"\n") < 5:
                        tail = fh.read(slack)
                        if not tail:
                            break
                        buf += tail
                    line_starts = [0] if boundary_is_line_start else []
                    pos = buf.find(b"\n")
                    while pos != -1:
                        if pos + 1 < len(buf):
                            line_starts.append(pos + 1)
                        pos = buf.find(b"\n", pos + 1)
                    first = _fastq_align(buf, line_starts)
                    if first is None:
                        continue
                    i = first
                    while i < len(line_starts):
                        hdr_off = line_starts[i]
                        if int(start) + hdr_off >= int(end):
                            break  # next chunk owns it
                        if i + 3 >= len(line_starts):
                            break  # truncated trailing record (EOF): drop
                        rec = [
                            (
                                buf[line_starts[i + j] : line_starts[i + j + 1] - 1]
                                if i + j + 1 < len(line_starts)
                                else buf[line_starts[i + j] :].rstrip(b"\n")
                            ).rstrip(b"\r")  # CRLF files: \n is sliced off, strip the \r too
                            for j in range(4)
                        ]
                        # re-validate the frame instead of trusting i+=4
                        # blindly: a blank or stray line mid-file would
                        # shift every later record into garbage (or an
                        # IndexError on ''.split()[0]) — resync by
                        # advancing to the next plausible header
                        if not rec[0].startswith(b"@") or len(rec[2]) == 0 or rec[2][:1] != b"+":
                            i += 1
                            continue
                        hdr_fields = rec[0].decode().split()
                        if not hdr_fields:
                            i += 1
                            continue
                        out_id.append(hdr_fields[0].lstrip("@"))
                        out_seq.append(rec[1].decode())
                        out_qual.append(rec[3].decode())
                        i += 4
            yield pd.DataFrame({"read_id": out_id, "seq": out_seq, "qual": out_qual})

    plan = _chunk_plan(spark, path, chunk_bytes)
    return plan.mapInPandas(parse, schema="read_id string, seq string, qual string")


def read_fasta_parallel(
    spark: SparkSession, path: str, chunk_mb: int = 64, chunk_bytes: int | None = None
) -> DataFrame:
    """S3 at single-file scale: (id, seq) with one task per chunk_mb byte
    range. FASTA alignment is unambiguous: '>' only ever starts a header
    line. Same ownership contract as read_fastq_parallel: a record
    belongs to the chunk containing its '>' byte; the owning task reads
    forward past its end until the next header or EOF."""
    chunk_bytes = chunk_bytes or chunk_mb * 1024 * 1024

    def parse(it):
        import pandas as pd

        for pdf in it:
            out_id, out_seq = [], []
            for f, start, end in zip(pdf["file"], pdf["start"], pdf["end"]):
                with open(f, "rb") as fh:
                    boundary_is_line_start = _open_at(fh, int(start))
                    need = int(end) - int(start)
                    buf = fh.read(need)
                    # first OWNED header offset in buf
                    if boundary_is_line_start and buf[:1] == b">":
                        first = 0
                    else:
                        p = buf.find(b"\n>")
                        first = p + 1 if p != -1 else None
                    if first is None or int(start) + first >= int(end):
                        continue
                    # owned headers = those whose '>' byte is < end
                    owned = [first]
                    p = buf.find(b"\n>", first)
                    while p != -1 and int(start) + p + 1 < int(end):
                        owned.append(p + 1)
                        p = buf.find(b"\n>", p + 1)
                    if p != -1:
                        stop = p + 1  # first non-owned header: truncate there
                        buf = buf[:stop]
                    else:
                        # last owned record continues past `end`: extend
                        # until the next header or EOF ('\n>' may straddle
                        # a read boundary → rescan from len(buf)-1)
                        while True:
                            scan_from = max(len(buf) - 1, 0)
                            tail = fh.read(chunk_bytes)
                            if not tail:
                                break
                            buf += tail
                            q = buf.find(b"\n>", scan_from)
                            if q != -1:
                                buf = buf[: q + 1]
                                break
                    segments = [
                        buf[h : owned[k + 1] - 1] if k + 1 < len(owned) else buf[h:]
                        for k, h in enumerate(owned)
                    ]
                    for seg in segments:
                        lines = seg.split(b"\n")
                        hdr = lines[0][1:].decode()
                        out_id.append(hdr.split()[0] if hdr.split() else "")
                        out_seq.append(
                            "".join(ln.decode().strip() for ln in lines[1:] if not ln.startswith(b">"))
                        )
            yield pd.DataFrame({"id": out_id, "seq": out_seq})

    plan = _chunk_plan(spark, path, chunk_bytes)
    return plan.mapInPandas(parse, schema=FASTA_SCHEMA)


# --- S6: GenBank (phage organism, host) --------------------------------------


def genbank_phage_hosts(spark: SparkSession, path: str) -> DataFrame:
    """S6 — extract (organism, host) per GenBank record
    (bin/Genbank2phagehost.py:24-34): record-stateful → per-file parse."""
    files = spark.sparkContext.wholeTextFiles(path)

    def parse(kv):
        _, content = kv
        organism = host = None
        for line in content.splitlines():
            ls = line.strip()
            if ls.startswith("ORGANISM"):
                organism = ls[len("ORGANISM") :].strip()
            elif ls.startswith('/host="'):
                host = ls.split('"')[1]
            elif ls.startswith("//"):
                if organism:
                    yield (organism, host)
                organism = host = None
        if organism:
            yield (organism, host)

    return files.flatMap(parse).toDF("organism string, host string")


# --- S7: pilerCR report → spacers ---------------------------------------------


def pilercr_spacers(spark: SparkSession, path: str) -> DataFrame:
    """S7 — CRISPR spacer extraction from pilerCR reports, mirroring the
    reference's line-state machine exactly (bin/ExtractSpacers.pl:44-77):

    - a ``>name`` line in the DETAIL REPORT opens an array (flag=1);
    - every ``^\\s+digits`` row inside the array emits its LAST
      whitespace-separated field as the spacer with a per-array counter
      (the Perl's ``$name . "_$SpaceCount"`` becomes (array_id, position));
    - the second ``===`` ruler line closes the array, so the post-ruler
      consensus row is never emitted;
    - ``SUMMARY BY`` sections are skipped until ``DETAIL REPORT`` resumes.

    Per-report state never crosses file boundaries, so reports parse in
    parallel one-per-task (wholeTextFiles partitioning)."""
    files = spark.sparkContext.wholeTextFiles(path)

    def parse(kv):
        _, content = kv
        name, flag, in_summary, header, pos = None, False, False, False, 0
        for line in content.splitlines():
            if "SUMMARY BY" in line:
                in_summary = True
                continue
            if "DETAIL REPORT" in line:
                in_summary = False
                continue
            if in_summary:
                continue
            ls = line.strip()
            if not flag and ls.startswith(">") and len(ls) > 1:
                name = ls[1:].split()[0]
                flag, header, pos = True, False, 0
            elif flag and line.startswith("==="):
                if not header:
                    header = True
                else:
                    name, flag, header, pos = None, False, False, 0
            elif flag and line[:1].isspace() and ls and ls.split()[0].isdigit():
                pos += 1
                yield (name, pos, ls.split()[-1])

    return files.flatMap(parse).toDF("array_id string, position int, spacer string")


# --- cd-hit .clstr -----------------------------------------------------------


def cdhit_clusters(spark: SparkSession, path: str) -> DataFrame:
    """cd-hit/cd-hit-est .clstr cluster report → one row per member:
    (cluster, member_idx, length, member, percent_id, is_rep)
    (bin/ParseClusters.pl:44-63 consumes this format to build the
    ReferenceGenes tables via bin/PrepareProtClusters.sh:77; the '*'
    marker is the cluster representative, 'at NN.NN%' the member
    identity). Cluster state never crosses files → per-file parallel
    parse, like the other stanza formats."""
    import re

    files = spark.sparkContext.wholeTextFiles(path)
    mem = re.compile(
        r"^(\d+)\s+(\d+)(?:aa|nt),\s+>(.*?)\.\.\.\s+(.*)$"
    )

    def parse(kv):
        _, content = kv
        cluster = None
        for line in content.splitlines():
            if line.startswith(">"):
                cluster = "_".join(line[1:].split())
                continue
            m = mem.match(line.strip())
            if m is None or cluster is None:
                continue
            idx, length, name, tail = m.groups()
            tail = tail.strip()
            if tail.startswith("*"):
                pct, is_rep = None, True
            else:
                pm = re.search(r"at\s+[+-]?/?([\d.]+)%", tail)
                pct = float(pm.group(1)) if pm else None
                is_rep = False
            yield (cluster, int(idx), int(length), name, pct, is_rep)

    return files.flatMap(parse).toDF(
        "cluster string, member_idx int, length int, member string, "
        "percent_id double, is_rep boolean"
    )


# --- S8: EMBL .dat ------------------------------------------------------------


def embl_records(spark: SparkSession, path: str) -> DataFrame:
    """S8 — EMBL flat-file ID/OS/host stanza parse
    (bin/ProteinNetworkCreation.pl:99-131, bin/dat2fasta.pl):
    (record_id, organism, host)."""
    files = spark.sparkContext.wholeTextFiles(path)

    def parse(kv):
        _, content = kv
        rid = organism = host = None
        for line in content.splitlines():
            if line.startswith("ID "):
                rid = line[3:].split(";")[0].strip()
            elif line.startswith("OS "):
                organism = line[3:].strip()
            elif "/host=" in line:
                host = line.split('"')[1] if '"' in line else None
            elif line.startswith("//"):
                if rid:
                    yield (rid, organism, host)
                rid = organism = host = None
        if rid:
            yield (rid, organism, host)

    return files.flatMap(parse).toDF("record_id string, organism string, host string")
