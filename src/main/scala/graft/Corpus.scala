package graft

/** The declared t2 operator contract (SURVEY.md §2 / Appendix A,
  * machine-readable twin of `verification/t2_corpus.py`).
  *
  * Each entry carries the Spark-dialect SQL (the verified lowering every
  * graft API path must reproduce) and the DuckDB-dialect oracle SQL the
  * driver runs for the hash compare. 39 of 49 share one ANSI text; the rest
  * split per SURVEY.md H8 (explode/unnest, get_json_object/json_extract,
  * datediff argument order, percentile/quantile_cont, array functions).
  *
  * DataFrame-API implementations of these operators live in
  * [[graft.Queries]]; this object is purely declarative so the contract has
  * a single source of truth.
  */
final case class CorpusQuery(name: String, sparkSql: String, duckSql: String)

object Corpus {

  private def q(name: String, sql: String) = CorpusQuery(name, sql, sql)
  private def q2(name: String, spark: String, duck: String) = CorpusQuery(name, spark, duck)

  // DEGENERATE-INPUT SCOPE: these declared similarity texts use a bare
  // divide — on a zero-norm embedding Spark 4 (ANSI) throws rather than
  // returning NaN. The contract is defined on the driver fixtures, which
  // contain no zero-norm vectors (invariant); the LIBRARY surface pins the
  // wider semantics instead (VectorOps.cosine → NaN, Ann ranks NaN last —
  // SURVEY H13/H14, VectorOpsSpec).
  private def simSpark = simOf("p", "g")

  private def simDuck = simDuckOf("p", "g")

  // ---- generators shared by the q50+ extension queries (both dialects) ----

  /** round(cosine(a.embedding, b.embedding), 6) — Spark HOF form (linear
    * left-fold, same accumulation order as DuckDB's list kernels). */
  private def simOf(a: String, b: String): String =
    s"""round(aggregate(zip_with($a.embedding, $b.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform($a.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform($b.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6)"""

  private def simDuckOf(a: String, b: String): String =
    s"round(list_cosine_similarity($a.embedding::DOUBLE[], $b.embedding::DOUBLE[]),6)"

  private val stopPred =
    "w = 'the' or w = 'a' or w = 'of' or w = 'and' or w = 'to' or w = 'in' or w = 'is' or w = 'it'"

  /** Distinct (doc_id, word) token relation; `flt` is an optional where. */
  private def sparkTok(flt: String) =
    s"select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents$flt) x"
  private def duckTok(flt: String) =
    s"select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents$flt) x"

  /** i-th minhash: md5 keyed by seed prefix, lexicographic min of hex =
    * numeric min of the underlying 48-bit value. Engine-portable (md5 is the
    * hash both dialects share). */
  private def mh(i: Int) = s"min(substr(md5(concat('$i:',w)),1,12)) h$i"

  /** MinHash+LSH near-dup: 8-hash signature, 4 bands x 2 rows, band-bucket
    * self-join for candidates, exact-Jaccard verify at 0.8. The scale path
    * for q34's quadratic inverted-index join: candidates are found in
    * ~O(n) bucket groups instead of O(n^2) pair space. */
  private def lshSql(wsrc: String): String =
    s"""with w as ($wsrc),
 sig as (select doc_id, ${(1 to 8).map(mh).mkString(",\n   ")} from w group by doc_id),
 bands as (select doc_id, concat('b1:',h1,h2) bk from sig
  union all select doc_id, concat('b2:',h3,h4) from sig
  union all select doc_id, concat('b3:',h5,h6) from sig
  union all select doc_id, concat('b4:',h7,h8) from sig),
 cand as (select distinct a.doc_id d1, b.doc_id d2 from bands a join bands b on a.bk=b.bk and a.doc_id < b.doc_id),
 sizes as (select doc_id, count(*) n from w group by doc_id),
 inter as (select c.d1, c.d2, count(*) i from cand c
   join w a on a.doc_id=c.d1 join w b on b.doc_id=c.d2 and b.w=a.w group by c.d1, c.d2)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200"""

  /** q190: the fuzzy-decontamination kernel's SQL twin — crossNearDup's
    * exact banding at threshold 0.8 (minhashParamsFor(0.8, 0.9, 32) =
    * k 30, bands 6, r 5; the native minhash_sig's seeded 48-bit md5
    * minima ARE the lexicographic minima of these fixed-width hex
    * prefixes, and any injective band-key rendering partitions buckets
    * identically), candidates restricted to corpus×eval (eval = docs
    * with id < 10), token-set Jaccard verify at 0.8. */
  private def fuzzyDecontamSql(wsrc: String): String = {
    val sigs = (1 to 30).map(mh).mkString(",\n   ")
    val bandExprs = (0 until 6).map { b =>
      val hs = (1 to 5).map(i => s"h${b * 5 + i}").mkString(",")
      s"select doc_id, concat('$b:',$hs) bk from sig"
    }.mkString("\n  union all ")
    s"""with w as ($wsrc),
 sig as (select doc_id, $sigs from w group by doc_id),
 bands as ($bandExprs),
 ebands as (select doc_id eid, bk from bands where doc_id < 10),
 cand as (select distinct b.doc_id, e.eid from bands b join ebands e on b.bk = e.bk),
 sizes as (select doc_id, count(*) n from w group by doc_id),
 inter as (select c.doc_id, c.eid, count(*) cnt from cand c
   join w a on a.doc_id = c.doc_id join w b on b.doc_id = c.eid and b.w = a.w
   group by c.doc_id, c.eid)
 select distinct i.doc_id doc_id from inter i
 join sizes s1 on s1.doc_id = i.doc_id join sizes s2 on s2.doc_id = i.eid
 where cast(i.cnt as double) / (s1.n + s2.n - i.cnt) >= 0.8 order by 1"""
  }

  /** Bit j (0..15) of a word's 16-bit hash, taken from the first 4 hex
    * digits of md5(w). Integer math via floor() so DuckDB's rounding CAST
    * (H5) never engages. */
  private val simhashBit =
    "cast(floor((instr('0123456789abcdef', substr(md5(w), 1 + cast(floor(j/4) as int), 1)) - 1) / cast(power(2, j % 4) as int)) as int) % 2"

  /** 16-bit SimHash per doc: +-1 vote per (distinct word, bit), bit set when
    * the vote sum is positive. */
  private def simhashSql(wsrc: String, seqExpr: String): String =
    s"""with w as ($wsrc),
 bits as (select doc_id, j, sum(case when $simhashBit = 1 then 1 else -1 end) s
  from w cross join (select $seqExpr j) js group by doc_id, j)
 select doc_id, cast(sum(case when s > 0 then cast(power(2, j) as bigint) else 0 end) as bigint) simhash
 from bits group by doc_id order by doc_id limit 300"""

  /** Embedding near-dup: all pairs with cosine >= 0.44 (rounded to 6dp
    * before thresholding so ulp noise cannot flip membership). */
  private def neardupSql(sim: (String, String) => String): String =
    s"""select a.vec_id d1, b.vec_id d2, ${sim("a", "b")} s
 from embeddings a join embeddings b on a.vec_id < b.vec_id
 where ${sim("a", "b")} >= 0.44 order by d1, d2 limit 200"""

  /** IVF-style ANN: vec_id<8 are the coarse centroids; every vector is
    * assigned to its nearest centroid (the "inverted list"); probes
    * (vec_id>=490) search only their own list. The scale path for q35/q36's
    * brute-force scan: cluster-local search touches ~1/K of the corpus. */
  private def ivfSql(sim: (String, String) => String): String =
    s"""with assign as (
  select v.vec_id, c.vec_id cid,
   row_number() over (partition by v.vec_id order by ${sim("v", "c")} desc, c.vec_id) rn
  from embeddings v join embeddings c on c.vec_id < 8 where v.vec_id >= 8),
 clu as (select vec_id, cid from assign where rn = 1),
 scored as (
  select p.vec_id probe, p.cid, g.vec_id cand, ${sim("pe", "ge")} s,
   row_number() over (partition by p.vec_id order by ${sim("pe", "ge")} desc, g.vec_id) rn
  from clu p join embeddings pe on pe.vec_id = p.vec_id
  join clu g on g.cid = p.cid and g.vec_id < 490
  join embeddings ge on ge.vec_id = g.vec_id
  where p.vec_id >= 490)
 select probe, cid, cand, s from scored where rn = 1 order by probe"""

  /** Signed projection onto pseudo-random hyperplane j: weights are md5-keyed
    * integers in [-7,8], so both engines compute identical products. */
  private val hyperSpark: Int => String = j =>
    s"""aggregate(sequence(1,64), cast(0.0 as double),
 (acc,i) -> acc + cast(element_at(e.embedding, i) as double) * (instr('0123456789abcdef', substr(md5(concat(cast($j as string),':',cast(i as string))),1,1)) - 8))"""
  private val hyperDuck: Int => String = j =>
    s"""list_sum(list_transform(generate_series(1,64),
 i -> e.embedding[i]::DOUBLE * (instr('0123456789abcdef', substr(md5(concat($j,':',i)),1,1)) - 8)))"""

  /** Random-hyperplane LSH ANN: 4-bit sign bucket per vector, probes search
    * only their bucket (~1/16 of the corpus at uniform spread). */
  private def annLshSql(sim: (String, String) => String, hyper: Int => String): String = {
    val bits = (1 to 4)
      .map(j => s"case when round(${hyper(j)},6) >= 0 then '1' else '0' end")
      .mkString(", ")
    s"""with bk as (select e.vec_id, concat($bits) bucket from embeddings e),
 scored as (
  select p.vec_id probe, pb.bucket, g.vec_id cand, ${sim("p", "g")} s,
   row_number() over (partition by p.vec_id order by ${sim("p", "g")} desc, g.vec_id) rn
  from embeddings p join bk pb on pb.vec_id = p.vec_id
  join bk gb on gb.bucket = pb.bucket and gb.vec_id >= 8 and gb.vec_id < 490
  join embeddings g on g.vec_id = gb.vec_id
  where p.vec_id >= 490)
 select probe, bucket, cand, s from scored where rn = 1 order by probe"""
  }

  /** Bucketed embedding near-dup (q76): 4 hash tables x 2 sign bits from
    * disjoint md5-keyed hyperplanes; candidates co-habit any table's bucket
    * (equi join on the bucket key — never the all-pairs space), then exact
    * cosine verify at the q58 threshold. Same operator q58 declares, scale
    * path instead of audit path. */
  private def neardupLshSql(sim: (String, String) => String, hyper: Int => String): String = {
    def bucket(tbl: Int): String = {
      val bits = ((tbl - 1) * 2 + 1 to (tbl - 1) * 2 + 2)
        .map(j => s"case when round(${hyper(j)},6) >= 0 then '1' else '0' end")
        .mkString(", ")
      s"select e.vec_id, concat('t$tbl:', $bits) bk from embeddings e"
    }
    s"""with bk as (${(1 to 4).map(bucket).mkString("\n union all ")}),
 cand as (select distinct a.vec_id d1, b.vec_id d2 from bk a join bk b on a.bk=b.bk and a.vec_id < b.vec_id)
 select c.d1, c.d2, ${sim("a", "b")} s
 from cand c join embeddings a on a.vec_id=c.d1 join embeddings b on b.vec_id=c.d2
 where ${sim("a", "b")} >= 0.44 order by d1, d2 limit 200"""
  }

  private val q73Spark =
    """with d as (select user_id, cast(ts as date) day from events group by user_id, cast(ts as date)),
 c as (select user_id, min(day) cohort from d group by user_id)
 select cast(c.cohort as timestamp) cohort, datediff(d.day, c.cohort) offset_days, count(distinct d.user_id) active
 from d join c on d.user_id=c.user_id
 group by c.cohort, datediff(d.day, c.cohort) order by cohort, offset_days limit 300"""

  private val q73Duck =
    """with d as (select user_id, cast(ts as date) as day from events group by user_id, cast(ts as date)),
 c as (select user_id, min(day) cohort from d group by user_id)
 select cast(c.cohort as timestamp) cohort, date_diff('day', c.cohort, d.day) offset_days, count(distinct d.user_id) active
 from d join c on d.user_id=c.user_id
 group by c.cohort, date_diff('day', c.cohort, d.day) order by cohort, offset_days limit 300"""

  /** RFM quartiles by VALUE breakpoints (quantile of the metric, rounded to
    * the 4dp grid), not row-ordinal ntile: a global un-partitioned ntile
    * window funnels every customer through one task — the breakpoint form is
    * one tiny agg (broadcast) + a per-row comparison, no global sort.
    * Bucket = 1 + #breakpoints strictly below the value; ties go low. */
  private def q74Sql(pct: (String, String) => String, days: String): String = {
    def b(x: String, q: String): String =
      s"1 + (case when $x > ${q}1 then 1 else 0 end) + (case when $x > ${q}2 then 1 else 0 end) + (case when $x > ${q}3 then 1 else 0 end)"
    s"""with r as (select o_custkey, max(o_orderdate) last_o, count(*) f,
   sum(cast(o_totalprice as decimal(18,4))) m from orders group by o_custkey),
 v as (select o_custkey, f, cast($days as double) rk,
   cast(f as double) fv, round(cast(m as double),4) mv from r),
 b as (select
   round(${pct("rk", "0.25")},4) r1, round(${pct("rk", "0.5")},4) r2, round(${pct("rk", "0.75")},4) r3,
   round(${pct("fv", "0.25")},4) f1, round(${pct("fv", "0.5")},4) f2, round(${pct("fv", "0.75")},4) f3,
   round(${pct("mv", "0.25")},4) m1, round(${pct("mv", "0.5")},4) m2, round(${pct("mv", "0.75")},4) m3
  from v)
 select o_custkey, f, mv, ${b("rk", "r")} r_bucket, ${b("fv", "f")} f_bucket, ${b("mv", "m")} m_bucket
 from v cross join b order by o_custkey limit 300"""
  }

  private val q74Spark = q74Sql((c, p) => s"percentile($c, $p)",
    "datediff(cast(last_o as date), date '1970-01-01')")
  private val q74Duck = q74Sql((c, p) => s"quantile_cont($c, $p)",
    "date_diff('day', date '1970-01-01', cast(last_o as date))")


  /** q169: 3-iteration PageRank in EXACT INTEGER micro-rank units over
    * the symmetric part↔supplier bipartite graph. Integer state is what
    * makes an iterative float recurrence HASHABLE cross-engine: bigint
    * sums are order-independent, the per-edge `round(r/outd)` quotient
    * is deterministic (correctly-rounded IEEE division; exact x.5
    * quotients DO occur — r odd, outd = 2 — but both engines round
    * positive halves away from zero, so the grid agrees), and
    * `(1 - 0.85)` is SPELLED as the subtraction both engines
    * evaluate to the same double (the literal `0.15` differs in the
    * last ulp). Symmetric edges ⇒ no dangling nodes ⇒ the mass term
    * drops from the unrolled text, and every node has an in-edge ⇒ the
    * inner-join c_i CTEs lose no nodes (on a graph with in-degree-0
    * nodes this unrolling would drop them where the library's left
    * join keeps them); DuckDB's sum(bigint) widens to
    * HUGEINT, consumed only via the double product, so schemas agree. */
  private def q169Sql(cast: String): String = {
    def iter(i: Int): String =
      s""" c$i as (select ed.dst node, sum(cast(round(r${i - 1}.r / d.outd) as bigint)) m
 from ed join r${i - 1} on r${i - 1}.node = ed.src join deg d on d.src = ed.src group by ed.dst),
 r$i as (select c$i.node, cast(round((1 - 0.85) * 1000000000.0 / n + 0.85 * c$i.m) as bigint) r from c$i cross join nn),"""
    s"""with ed as (select distinct src, dst from (
   select concat('p', cast(l_partkey as $cast)) src, concat('s', cast(l_suppkey as $cast)) dst from lineitem
   union all
   select concat('s', cast(l_suppkey as $cast)) src, concat('p', cast(l_partkey as $cast)) dst from lineitem) t),
 nodes as (select distinct src node from ed),
 nn as (select count(*) n from nodes),
 deg as (select src, count(*) outd from ed group by src),
 r0 as (select node, cast(round(1000000000.0 / n) as bigint) r from nodes cross join nn),
${(iter(1) + iter(2) + iter(3)).stripSuffix(",")}
 select node, r from r3 order by r desc, node limit 100"""
  }

  /** q182: 3-iteration WEIGHTED PageRank — the q169 bit-contract with
    * edge MULTIPLICITY as weight: the part↔supplier edge (p, s) carries
    * w = its lineitem row count, and each node's vote splits over its
    * out-edges in proportion to w — `round(r·w / Σw)` per edge instead
    * of `round(r / outdeg)`. Still exactly hashable: w and the
    * out-weight sums are integers, r·w stays far under 2^53 (so the
    * double products both engines form are exact), the quotient is one
    * correctly-rounded IEEE division, and the per-edge share casts to
    * bigint before the order-independent integer sum — the identical
    * determinism argument as q169, with `r·w` in place of `r`. DuckDB
    * widens sum(bigint) to HUGEINT (deg + m), consumed only via double
    * products, so output schemas agree. The symmetric construction
    * again leaves no dangling nodes and no in-degree-0 nodes. Library
    * twin: [[graft.ops.GraphOps.pageRankWeighted]] (same micro-rank
    * machinery; constant weights reduce it to q169's unweighted form —
    * spec-pinned). */
  private def q182Sql(cast: String): String = {
    def iter(i: Int): String =
      s""" c$i as (select ed.dst node, sum(cast(round(r${i - 1}.r * ed.w / d.outd) as bigint)) m
 from ed join r${i - 1} on r${i - 1}.node = ed.src join deg d on d.src = ed.src group by ed.dst),
 r$i as (select c$i.node, cast(round((1 - 0.85) * 1000000000.0 / n + 0.85 * c$i.m) as bigint) r from c$i cross join nn),"""
    s"""with pw as (select concat('p', cast(l_partkey as $cast)) p, concat('s', cast(l_suppkey as $cast)) s, count(*) w
   from lineitem group by 1, 2),
 ed as (select p src, s dst, w from pw union all select s src, p dst, w from pw),
 nodes as (select distinct src node from ed),
 nn as (select count(*) n from nodes),
 deg as (select src, sum(w) outd from ed group by src),
 r0 as (select node, cast(round(1000000000.0 / n) as bigint) r from nodes cross join nn),
${(iter(1) + iter(2) + iter(3)).stripSuffix(",")}
 select node, r from r3 order by r desc, node limit 100"""
  }

  /** q184: 2-iteration HITS hubs/authorities in EXACT INTEGER walk
    * counts — the q169 bit-contract applied to Kleinberg's algorithm.
    * The graph is the DIRECTED part→supplier edge set (distinct — HITS
    * is adjacency-defined, [[graft.ops.GraphOps.hitsCounts]] collapses
    * multi-edges the same way); with h0 = 1, every half-step
    * `a = A^T h` / `h = A a` is a plain `sum(bigint)` over an equi
    * join — order-independent integer arithmetic, no division, no
    * rounding grid, so the result is bit-identical on any engine.
    * Magnitudes grow ~(in-deg·out-deg) per round: ≤ ~1e6 at sf0.1,
    * far under 2^63 at any plausible SF for depth 2. DuckDB widens
    * sum(bigint) to HUGEINT — both sides cast each level's value back
    * to bigint so schemas agree. Nodes with no in-edge have auth 0,
    * no out-edge hub 0 (the coalesce'd left joins keep every node in
    * the frame, matching the operator's node-complete contract).
    * Library twin: [[graft.ops.GraphOps.hits]] (same matvecs,
    * L1-normalized per half-step for unbounded depth). */
  private def q184Sql(cast: String): String = {
    def a(k: Int, prevH: String): String =
      s""" a$k as (select n.node, cast(coalesce(t.v, 0) as bigint) v from nodes n
  left join (select pe.dst, sum($prevH.v) v from pe join $prevH on $prevH.node = pe.src group by pe.dst) t on t.dst = n.node),"""
    def h(k: Int): String =
      s""" h$k as (select n.node, cast(coalesce(t.v, 0) as bigint) v from nodes n
  left join (select pe.src, sum(a$k.v) v from pe join a$k on a$k.node = pe.dst group by pe.src) t on t.src = n.node),"""
    s"""with pe as (select distinct concat('p', cast(l_partkey as $cast)) src, concat('s', cast(l_suppkey as $cast)) dst from lineitem),
 nodes as (select src node from pe union select dst from pe),
 h0 as (select node, cast(1 as bigint) v from nodes),
${(a(1, "h0") + h(1) + a(2, "h1") + h(2)).stripSuffix(",")}
 select h2.node, h2.v hub, a2.v auth from h2 join a2 on a2.node = h2.node
 order by hub desc, auth desc, h2.node limit 100"""
  }

  /** q183: robots.txt (RFC 9309) path-pattern semantics as a declared
    * cross-engine convention. The REP glob — `*` matches any octet
    * sequence, ONE trailing `$` anchors the end, anything else is a
    * PREFIX pattern — is exactly SQL LIKE after a mechanical
    * translation (drop one trailing `$`, `*` → `%`, append `%` unless
    * anchored), PROVIDED the pattern carries no literal `%`/`_` (the
    * fixture doesn't; the library glob needs no such caveat). The
    * DataFrame impl runs the REAL operator ([[graft.ops.Robots.matches]]
    * — the iterative greedy-backtrack glob) row by row, so the hash
    * gate pins op ≡ Spark LIKE ≡ DuckDB LIKE in one stroke (the q181
    * discipline: the impl IS the op). Pattern matrix covers bare
    * prefix, anchored mid-`*` glob, non-matching prefix, id-derived
    * prefix, leading-`*` anchored suffix, and an unanchored multi-`*`
    * form; paths vary extension/directory shape by id. */
  private def q183Sql(cast: String): String =
    s"""with pp as (select doc_id,
  case cast(doc_id % 6 as int)
    when 0 then '/p'
    when 1 then '/p/*.html$$'
    when 2 then '/q'
    when 3 then concat('/p/', cast(doc_id % 7 as $cast))
    when 4 then '*html$$'
    else '/p/*/' end pattern,
  concat('/p/', cast(doc_id % 7 as $cast),
    case cast(doc_id % 3 as int) when 0 then '.html' when 1 then '.txt' else '/' end) path
 from documents where doc_id < 300),
 tr as (select doc_id, pattern, path,
   concat(replace(case when pattern like '%$$' then substr(pattern, 1, length(pattern) - 1) else pattern end, '*', '%'),
          case when pattern like '%$$' then '' else '%' end) lk
  from pp)
 select doc_id, pattern, path, path like lk AS matched
 from tr order by doc_id limit 300"""

  /** q170: 3-iteration PERSONALIZED PageRank — same graph, same exact
    * integer micro-rank bit-contract as q169, but the (1−d) teleport mass
    * lands only on the SEED set (the supplier nodes, `s%`): non-seed
    * ranks start at 0 and receive only propagated mass, so rank decays
    * with distance from the seeds. Same unrolling caveats as q169 (no
    * dangling nodes and every node has an in-edge on the symmetric
    * graph, so the inner-join c_i CTEs lose nothing); the per-node seed
    * flag joins back in from the node table each round. */
  private def q170Sql(cast: String): String = {
    def iter(i: Int): String =
      s""" c$i as (select ed.dst node, sum(cast(round(r${i - 1}.r / d.outd) as bigint)) m
 from ed join r${i - 1} on r${i - 1}.node = ed.src join deg d on d.src = ed.src group by ed.dst),
 r$i as (select c$i.node, cast(round(case when nd.is_seed then (1 - 0.85) * 1000000000.0 / n + 0.85 * c$i.m else 0.85 * c$i.m end) as bigint) r
 from c$i join nd on nd.node = c$i.node cross join ns),"""
    s"""with ed as (select distinct src, dst from (
   select concat('p', cast(l_partkey as $cast)) src, concat('s', cast(l_suppkey as $cast)) dst from lineitem
   union all
   select concat('s', cast(l_suppkey as $cast)) src, concat('p', cast(l_partkey as $cast)) dst from lineitem) t),
 nd as (select node, node like 's%' is_seed from (select distinct src node from ed) x),
 ns as (select count(*) n from nd where is_seed),
 deg as (select src, count(*) outd from ed group by src),
 r0 as (select node, case when is_seed then cast(round(1000000000.0 / n) as bigint) else cast(0 as bigint) end r from nd cross join ns),
${(iter(1) + iter(2) + iter(3)).stripSuffix(",")}
 select node, r from r3 order by r desc, node limit 100"""
  }

  /** q171: 2-round synchronous LABEL PROPAGATION over the same symmetric
    * part↔supplier graph as q169/q170 — community detection with the
    * DETERMINISTIC tie-break (most-frequent neighbor label, ties to the
    * smallest label): counts are integers and the per-node winner is a
    * total-ordered row_number argmax, so the whole sweep is exactly
    * hashable cross-engine with no float anywhere. Multi-edges collapse
    * (distinct — one neighbor, one vote). The inner-join v_i CTEs drop
    * nodes with no out-edge, equivalent to the library's
    * keep-own-label left join only because the symmetric construction
    * gives every node an out-edge (the q169 unrolling caveat). */
  private def q171Sql(cast: String): String = {
    def round(i: Int): String =
      s""" v$i as (select ed.src node, l.lbl, count(*) c from ed join l${i - 1} l on l.node = ed.dst group by ed.src, l.lbl),
 l$i as (select node, lbl from (select node, lbl, row_number() over (partition by node order by c desc, lbl) rn from v$i) t where rn = 1),"""
    s"""with ed as (select distinct src, dst from (
   select concat('p', cast(l_partkey as $cast)) src, concat('s', cast(l_suppkey as $cast)) dst from lineitem
   union all
   select concat('s', cast(l_suppkey as $cast)) src, concat('p', cast(l_partkey as $cast)) dst from lineitem) t),
 l0 as (select distinct src node, src lbl from ed),
${(round(1) + round(2)).stripSuffix(",")}
 select node, lbl from l2 order by node limit 300"""
  }

  /** q172: per-node TRIANGLE COUNT. The q169 bipartite graph has no
    * triangles by construction, so this query derives a triangle-rich
    * graph instead: each sampled lineitem row seeds the 3-cycle
    * part↔supplier↔(orderkey mod 97) — shared parts/suppliers across
    * rows then create organic extra triangles. Counts are exact
    * integers (trivially hashable cross-engine, no float anywhere).
    * The oracle closes ID-ORDERED wedges over the canonical (lo < hi)
    * undirected edge set — each triangle a<b<c counted exactly once by
    * three equi joins; the library operator (GraphOps.triangleCount)
    * computes the same counts with the DEGREE-ordered orientation that
    * bounds wedge fan-out by √(2E) at scale (a hub's id-ordered wedge
    * set is quadratic in its degree; degree-ordered is not). */
  private def q172Sql(cast: String): String = {
    val li = "from lineitem where l_orderkey % 20 = 0"
    s"""with raw as (
   select concat('p', cast(l_partkey as $cast)) a, concat('s', cast(l_suppkey as $cast)) b $li
   union all
   select concat('s', cast(l_suppkey as $cast)) a, concat('k', cast(l_orderkey % 97 as $cast)) b $li
   union all
   select concat('k', cast(l_orderkey % 97 as $cast)) a, concat('p', cast(l_partkey as $cast)) b $li),
 und as (select distinct least(a, b) lo, greatest(a, b) hi from raw where a <> b),
 tri as (select e1.lo a, e1.hi b, e2.hi c from und e1
   join und e2 on e2.lo = e1.hi
   join und e3 on e3.lo = e1.lo and e3.hi = e2.hi),
 pern as (select node, count(*) triangles from (
   select a node from tri union all select b from tri union all select c from tri) t
   group by node),
 nodes as (select lo node from und union select hi from und)
 select n.node, coalesce(p.triangles, cast(0 as bigint)) triangles
 from nodes n left join pern p on p.node = n.node
 order by n.node limit 300"""
  }

  /** q173: LOCAL CLUSTERING COEFFICIENT over the q172 graph —
    * `c = 2T/(d(d−1))`, 0 for degree < 2. The one float op is a single
    * correctly-rounded IEEE division over exactly-representable integer
    * inputs, rounded to 4dp (the q74/q169 grid discipline), so the
    * normalized form stays exactly hashable. Same id-ordered triple-join
    * oracle as q172 plus a degree CTE; the library operator
    * (`GraphOps.clusteringCoefficient`) normalizes its degree-ordered
    * triangle counts with one extra node-scale join. */
  private def q173Sql(cast: String): String = {
    val li = "from lineitem where l_orderkey % 20 = 0"
    s"""with raw as (
   select concat('p', cast(l_partkey as $cast)) a, concat('s', cast(l_suppkey as $cast)) b $li
   union all
   select concat('s', cast(l_suppkey as $cast)) a, concat('k', cast(l_orderkey % 97 as $cast)) b $li
   union all
   select concat('k', cast(l_orderkey % 97 as $cast)) a, concat('p', cast(l_partkey as $cast)) b $li),
 und as (select distinct least(a, b) lo, greatest(a, b) hi from raw where a <> b),
 deg as (select node, count(*) d from (
   select lo node from und union all select hi from und) t group by node),
 tri as (select e1.lo a, e1.hi b, e2.hi c from und e1
   join und e2 on e2.lo = e1.hi
   join und e3 on e3.lo = e1.lo and e3.hi = e2.hi),
 pern as (select node, count(*) triangles from (
   select a node from tri union all select b from tri union all select c from tri) t
   group by node)
 select g.node, coalesce(p.triangles, cast(0 as bigint)) triangles, g.d degree,
   round(case when g.d >= 2 then 2.0 * coalesce(p.triangles, 0) / (g.d * (g.d - 1.0)) else 0.0 end, 4) clustering
 from deg g left join pern p on p.node = g.node
 order by g.node limit 300"""
  }

  /** q181's suffix alternation, interpolated from the op's own list —
    * one source of truth between the declared contract and
    * [[graft.ops.TextOps.registeredDomain]]. */
  private val pslAlt: String =
    graft.ops.TextOps.multiPartSuffixes.map(_.replace(".", "[.]")).mkString("|")

  val all: Seq[CorpusQuery] = Seq(
    q("q01_scan_filter_project",
      """select l_orderkey, l_linenumber, round(l_extendedprice*(1-l_discount),2) net
 from lineitem where l_quantity > 45 and l_shipdate >= timestamp '1997-01-01 00:00:00'
 order by l_orderkey, l_linenumber limit 100"""),

    q("q02_filter_in_like",
      """select p_partkey, p_name, p_type from part
 where p_type in ('PROMO','ECONOMY') and p_name like '%a%' order by p_partkey limit 100"""),

    // Decimal aggregation is kept INTERNAL (exact, order-independent sums —
    // SURVEY.md H2/H3) but the OUTPUT is cast to double on the value's exact
    // grid: parquet DECIMAL surfaces as decimal.Decimal objects in the
    // driver's pandas compare while the DuckDB oracle yields float64, which
    // hash-mismatches even on equal values (observed round 1: q03/q04/q18/
    // q38/q39/q40). The cast is deterministic (nearest double of an exact
    // 2–4dp value) and round(,4) pins it to the grid on both engines.
    q("q03_agg_tpch1_decimal",
      """select l_returnflag, l_linestatus,
 round(cast(sum(cast(l_quantity as decimal(18,4))) as double),4) sq,
 round(cast(sum(cast(l_extendedprice as decimal(18,4))) as double),4) sp,
 round(cast(sum(cast(l_extendedprice as decimal(18,4))*cast(1-l_discount as decimal(18,4))) as double),4) net, count(*) c
 from lineitem where l_shipdate <= timestamp '1998-09-02 00:00:00'
 group by l_returnflag, l_linestatus order by l_returnflag, l_linestatus"""),

    q("q04_having",
      """select o_custkey, count(*) c, round(cast(sum(cast(o_totalprice as decimal(18,4))) as double),4) s
 from orders group by o_custkey having count(*) >= 14 order by o_custkey"""),

    q("q05_count_distinct",
      """select count(distinct o_custkey) a, count(distinct o_orderpriority) b, count(distinct o_orderstatus) c from orders"""),

    q("q06_distinct",
      """select distinct l_returnflag, l_linestatus from lineitem order by 1,2"""),

    q("q07_join_inner",
      """select c.c_custkey, c.c_name, o.o_orderkey, o.o_orderstatus from customer c
 join orders o on c.c_custkey=o.o_custkey where c.c_mktsegment='BUILDING' order by c.c_custkey, o.o_orderkey limit 100"""),

    q("q08_join_left",
      """select c.c_custkey, count(o.o_orderkey) n from customer c
 left join orders o on c.c_custkey=o.o_custkey and o.o_totalprice > 400000
 group by c.c_custkey order by c.c_custkey limit 100"""),

    q("q09_join_full",
      """select coalesce(a.k, b.k) k, a.ca, b.cb from
 (select o_orderpriority k, count(*) ca from orders where o_orderstatus='F' group by o_orderpriority) a
 full join (select event_type k, count(*) cb from events group by event_type) b on a.k=b.k
 order by k"""),

    q("q10_join_semi_exists",
      """select p_partkey, p_name from part p
 where exists (select 1 from lineitem l where l.l_partkey=p.p_partkey and l.l_quantity > 49)
 order by p_partkey limit 100"""),

    q("q11_join_anti",
      """select c_custkey from customer c
 where not exists (select 1 from orders o where o.o_custkey=c.c_custkey and o.o_orderpriority='1-URGENT')
 order by c_custkey limit 100"""),

    q("q12_join_cross",
      """select r1.r_name a, r2.r_name b from region r1 cross join region r2 order by r1.r_name, r2.r_name"""),

    q("q13_join_theta",
      """select p1.p_brand, count(*) pairs from part p1
 join part p2 on p1.p_brand=p2.p_brand and p1.p_size < p2.p_size group by p1.p_brand order by p1.p_brand"""),

    q("q14_join_range_band",
      """select e1.event_id a, e2.event_id b from events e1 join events e2
 on e1.user_id=e2.user_id and e2.ts > e1.ts and e2.ts <= e1.ts + interval 5 minute
 where e1.event_type='click' and e2.event_type='purchase' order by e1.event_id, e2.event_id limit 100"""),

    q("q15_asof_correlated",
      """select p.event_id, (select max(c.ts) from events c
 where c.user_id=p.user_id and c.event_type='click' and c.ts <= p.ts) last_click
 from events p where p.event_type='purchase' order by p.event_id limit 200"""),

    q("q16_window_ranking",
      """select o_orderkey, o_custkey,
 row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rn,
 rank() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rk,
 dense_rank() over (partition by o_custkey order by o_totalprice desc, o_orderkey) dr,
 ntile(4) over (partition by o_custkey order by o_orderkey) nt
 from orders order by o_custkey, o_orderkey limit 200"""),

    q("q17_window_analytic",
      """select event_id, user_id,
 lag(value,1) over (partition by user_id order by ts, event_id) pv,
 lead(value,1) over (partition by user_id order by ts, event_id) nv,
 first_value(value) over (partition by user_id order by ts, event_id) fv,
 last_value(value) over (partition by user_id order by ts, event_id rows between unbounded preceding and unbounded following) lv
 from events order by user_id, event_id limit 300"""),

    q("q18_window_frames",
      """select o_orderkey, o_custkey,
 round(sum(o_totalprice) over (partition by o_custkey order by o_orderdate, o_orderkey rows between 3 preceding and current row),2) s3,
 round(cast(sum(cast(o_totalprice as decimal(18,4))) over (partition by o_custkey order by o_totalprice range between 50000 preceding and current row) as double),4) rs,
 count(*) over (partition by o_custkey order by o_totalprice range between 50000 preceding and current row) rc
 from orders order by o_custkey, o_orderkey limit 200"""),

    q("q19_topk_per_group",
      """select o_custkey, o_orderkey, o_totalprice, rn from
 (select o_custkey, o_orderkey, o_totalprice,
  row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rn from orders) t
 where rn <= 3 order by o_custkey, rn limit 300"""),

    q("q20_sort_offset",
      """select l_orderkey, l_linenumber, l_extendedprice from lineitem
 order by l_extendedprice desc, l_orderkey, l_linenumber limit 50 offset 100"""),

    q("q21_union",
      """select x from (select o_custkey x from orders where o_totalprice > 400000
 union select c_custkey from customer where c_acctbal < 0) t order by x limit 100"""),

    q("q22_intersect_except",
      """select x, 'i' tag from (select o_custkey x from orders where o_orderstatus='P'
 intersect select c_custkey from customer where c_acctbal > 0) t1
 union all
 select x, 'e' tag from (select c_custkey x from customer except select o_custkey from orders) t2
 order by tag, x limit 200"""),

    q2("q23_string_funcs",
      """select p_partkey, upper(p_name) u, lower(p_brand) lo, substr(p_name,1,5) s, length(p_name) len,
 replace(p_type,'A','@') rep, trim(concat(' ', p_name, ' ')) tr, lpad(cast(p_partkey as string), 8, '0') pad, reverse(p_brand) rev
 from part order by p_partkey limit 100""",
      """select p_partkey, upper(p_name) u, lower(p_brand) lo, substr(p_name,1,5) s, length(p_name) len,
 replace(p_type,'A','@') rep, trim(concat(' ', p_name, ' ')) tr, lpad(cast(p_partkey as varchar), 8, '0') pad, reverse(p_brand) rev
 from part order by p_partkey limit 100"""),

    q("q24_regexp",
      """select doc_id, regexp_extract(text, '([a-z]+)', 1) first_word from documents order by doc_id limit 100"""),

    q2("q25_date_funcs",
      """select o_orderkey, extract(year from o_orderdate) y, extract(month from o_orderdate) m,
 extract(day from o_orderdate) d, date_trunc('month', o_orderdate) mo, o_orderdate + interval 30 day plus30,
 datediff(cast(o_orderdate + interval 30 day as date), cast(o_orderdate as date)) dd
 from orders order by o_orderkey limit 100""",
      """select o_orderkey, extract(year from o_orderdate) y, extract(month from o_orderdate) m,
 extract(day from o_orderdate) d, date_trunc('month', o_orderdate) mo, o_orderdate + interval 30 day plus30,
 date_diff('day', o_orderdate, o_orderdate + interval 30 day) dd
 from orders order by o_orderkey limit 100"""),

    q("q26_math_funcs",
      """select l_orderkey, l_linenumber, round(abs(l_discount - 0.05),4) ab,
 cast(floor(l_quantity) as bigint) fl, cast(ceil(l_quantity) as bigint) ce,
 round(sqrt(l_extendedprice),4) sq, round(power(l_discount + 1, 2),6) pw,
 l_partkey % 7 md, cast(sign(l_discount - 0.05) as int) sg, round(ln(l_extendedprice),6) lg
 from lineitem order by l_orderkey, l_linenumber limit 100"""),

    q("q27_case_cast_coalesce",
      """select o_orderkey,
 case when o_totalprice > 300000 then 'big' when o_totalprice > 100000 then 'mid' else 'small' end bucket,
 coalesce(nullif(o_orderstatus,'O'),'open') st, cast(floor(o_totalprice) as bigint) ti
 from orders order by o_orderkey limit 200"""),

    q2("q28_json",
      """select event_id, cast(get_json_object(props,'$.k') as int) k from events order by event_id limit 200""",
      """select event_id, cast(json_extract(props,'$.k') as integer) k from events order by event_id limit 200"""),

    q2("q29_array_ops",
      """select vec_id, size(embedding) n, element_at(embedding,1) e1,
 round(aggregate(slice(embedding,1,8), cast(0.0 as double), (a,x)->a+cast(x as double)),4) s8,
 array_contains(embedding, element_at(embedding,1)) has1
 from embeddings order by vec_id limit 100""",
      """select vec_id, len(embedding) n, embedding[1] e1,
 round(list_sum(embedding[1:8]::DOUBLE[]),4) s8, list_contains(embedding, embedding[1]) has1
 from embeddings order by vec_id limit 100"""),

    // The list is emitted as a joined STRING, not an array column: the
    // driver's pandas compare cannot sort/hash ndarray cells (observed err
    // round 1). Same collect→sort semantics, canonical textual form.
    q2("q30_collect_sorted",
      """select l_orderkey, array_join(transform(sort_array(collect_list(l_linenumber)), x -> cast(x as string)), ',') ls from lineitem group by l_orderkey order by l_orderkey limit 100""",
      """select l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') ls from lineitem group by l_orderkey order by l_orderkey limit 100"""),

    q2("q31_wordcount",
      """select w, count(*) c from (select explode(split(text,' ')) w from documents) t group by w order by c desc, w""",
      """select w, count(*) c from (select unnest(string_split(text,' ')) w from documents) t group by w order by c desc, w"""),

    q2("q32_bigrams",
      """with tok as (select doc_id, pos, w from documents lateral view posexplode(split(text,' ')) t as pos, w)
 select concat(t1.w, ' ', t2.w) bg, count(*) c from tok t1 join tok t2 on t1.doc_id=t2.doc_id and t2.pos=t1.pos+1
 group by concat(t1.w, ' ', t2.w) order by c desc, bg limit 50""",
      """with tok as (select doc_id, generate_subscripts(l,1)-1 pos, unnest(l) w from (select doc_id, string_split(text,' ') l from documents) s)
 select concat(t1.w, ' ', t2.w) bg, count(*) c from tok t1 join tok t2 on t1.doc_id=t2.doc_id and t2.pos=t1.pos+1
 group by concat(t1.w, ' ', t2.w) order by c desc, bg limit 50"""),

    q("q33_dedup_exact",
      """select h, count(*) c, min(doc_id) keep from
 (select doc_id, md5(substr(text,1,16)) h from documents) t group by h having count(*) > 1 order by h limit 100"""),

    q2("q34_jaccard_neardup",
      """with t as (select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents where doc_id < 200) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.w=b.w and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200""",
      """with t as (select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents where doc_id < 200) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.w=b.w and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200"""),

    q2("q35_cosine_topk",
      s"""select g.vec_id, $simSpark sim from embeddings g join embeddings p on p.vec_id=0
 order by sim desc, g.vec_id limit 20""",
      s"""select g.vec_id, $simDuck sim from embeddings g join embeddings p on p.vec_id=0
 order by sim desc, g.vec_id limit 20"""),

    q2("q36_knn",
      s"""select p_id, g_id, s from (select p.vec_id p_id, g.vec_id g_id, $simSpark s,
 row_number() over (partition by p.vec_id order by $simSpark desc, g.vec_id) rn
 from embeddings p join embeddings g on g.vec_id >= 20 where p.vec_id < 20) t where rn = 1 order by p_id""",
      s"""select p_id, g_id, s from (select p.vec_id p_id, g.vec_id g_id, $simDuck s,
 row_number() over (partition by p.vec_id order by $simDuck desc, g.vec_id) rn
 from embeddings p join embeddings g on g.vec_id >= 20 where p.vec_id < 20) t where rn = 1 order by p_id"""),

    q("q37_sessionize",
      """with e as (select user_id, ts, event_id,
 case when lag(ts) over (partition by user_id order by ts, event_id) is null
      or ts - lag(ts) over (partition by user_id order by ts, event_id) > interval 30 minute then 1 else 0 end brk
 from events)
 select user_id, count(distinct sid) n_sessions from
 (select user_id, sum(brk) over (partition by user_id order by ts, event_id rows between unbounded preceding and current row) sid from e) t
 group by user_id order by user_id limit 200"""),

    q("q38_tumbling_window",
      """select date_trunc('hour', ts) w, event_type, count(*) c,
 round(cast(sum(cast(value as decimal(18,4))) as double),4) v from events group by date_trunc('hour', ts), event_type
 order by w, event_type limit 500"""),

    q("q39_sliding_window",
      """with e as (select case when extract(minute from ts) >= 30
   then date_trunc('hour', ts) + interval 30 minute else date_trunc('hour', ts) end b, value from events)
 select w, count(*) c, round(cast(sum(cast(value as decimal(18,4))) as double),4) v from
 (select b w, value from e union all select b - interval 30 minute w, value from e) t
 group by w order by w limit 500"""),

    q("q40_pivot_manual",
      """select user_id,
 count(case when event_type='click' then 1 end) clicks,
 count(case when event_type='view' then 1 end) n_views,
 round(cast(sum(case when event_type='purchase' then cast(value as decimal(18,4)) else cast(0 as decimal(18,4)) end) as double),4) purchase_v
 from events group by user_id order by user_id limit 200"""),

    q("q41_scalar_subquery",
      """select o_orderkey, o_totalprice from orders
 where o_totalprice > (select max(o_totalprice) * 0.5 from orders) order by o_orderkey limit 200"""),

    q("q42_in_subquery",
      """select c_custkey from customer
 where c_custkey in (select o_custkey from orders where o_orderpriority='1-URGENT') order by c_custkey limit 200"""),

    q("q43_rollup",
      """select l_returnflag f, l_linestatus s, count(*) c from lineitem
 group by rollup(l_returnflag, l_linestatus) order by f nulls first, s nulls first"""),

    q("q44_cube",
      """select coalesce(l_returnflag,'ALL') f, coalesce(l_linestatus,'ALL') s, count(*) c
 from lineitem group by cube(l_returnflag, l_linestatus) order by f, s"""),

    q("q45_grouping_sets",
      """select l_returnflag f, l_linestatus s, grouping(l_returnflag) gf, grouping(l_linestatus) gs, count(*) c
 from lineitem group by grouping sets ((l_returnflag),(l_returnflag,l_linestatus),())
 order by gf, gs, f nulls first, s nulls first"""),

    q2("q46_percentile",
      """select round(percentile(o_totalprice, 0.5),4) p50, round(percentile(o_totalprice, 0.9),4) p90 from orders""",
      """select round(quantile_cont(o_totalprice, 0.5),4) p50, round(quantile_cont(o_totalprice, 0.9),4) p90 from orders"""),

    q("q47_stats",
      """select l_returnflag, round(stddev_samp(l_extendedprice),2) sd,
 round(corr(l_extendedprice, l_quantity),6) co, round(covar_samp(l_extendedprice, l_quantity),2) cv
 from lineitem group by l_returnflag order by l_returnflag"""),

    q("q48_minmax_by",
      """select o_custkey, max_by(o_orderstatus, o_orderkey) last_st, min_by(o_orderstatus, o_orderkey) first_st,
 max(o_orderkey) mx from orders group by o_custkey order by o_custkey limit 200"""),

    q("q49_filtered_agg",
      """select l_returnflag, count(*) filter (where l_quantity > 25) hi, count(*) total,
 bool_or(l_discount > 0.09) anyhi, bool_and(l_quantity > 0) allpos
 from lineitem group by l_returnflag order by l_returnflag"""),

    // ---- q50+: LLM training-data pipeline extensions ----------------------
    // All md5-keyed so both engines compute identical values (md5 hex is the
    // one hash both dialects share); float accumulations either stay inside a
    // linear HOF fold (identical order both engines) or round(,6) before any
    // threshold/ranking so ulp noise cannot flip results (SURVEY.md H10).

    q2("q50_langid",
      s"""select doc_id, n_tok, round(hits / n_tok, 4) stop_ratio,
 case when hits / n_tok >= 0.04 then 'en' else 'und' end lang_guess
 from (select doc_id, cast(size(split(text,' ')) as double) n_tok,
  cast(size(filter(split(text,' '), w -> $stopPred)) as double) hits
 from documents) t order by doc_id limit 300""",
      s"""select doc_id, n_tok, round(hits / n_tok, 4) stop_ratio,
 case when hits / n_tok >= 0.04 then 'en' else 'und' end lang_guess
 from (select doc_id, cast(len(string_split(text,' ')) as double) n_tok,
  cast(len(list_filter(string_split(text,' '), w -> $stopPred)) as double) hits
 from documents) t order by doc_id limit 300"""),

    q2("q51_quality",
      """select doc_id, length(text) n_chars, size(split(text,' ')) n_tok,
 round(cast(size(array_distinct(split(text,' '))) as double) / size(split(text,' ')), 4) ttr,
 round(cast(length(replace(text,' ','')) as double) / size(split(text,' ')), 4) avg_wlen,
 case when size(split(text,' ')) >= 30 and size(array_distinct(split(text,' '))) >= 15 then 'keep' else 'drop' end verdict
 from documents order by doc_id limit 300""",
      """select doc_id, length(text) n_chars, len(string_split(text,' ')) n_tok,
 round(cast(len(list_distinct(string_split(text,' '))) as double) / len(string_split(text,' ')), 4) ttr,
 round(cast(length(replace(text,' ','')) as double) / len(string_split(text,' ')), 4) avg_wlen,
 case when len(string_split(text,' ')) >= 30 and len(list_distinct(string_split(text,' '))) >= 15 then 'keep' else 'drop' end verdict
 from documents order by doc_id limit 300"""),

    q2("q52_token_count",
      """select doc_id, size(split(text,' ')) ws_tokens,
 regexp_count(text, '[a-zA-Z]+') alpha_tokens,
 regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]') bpe_ish,
 length(text) n_chars from documents order by doc_id limit 300""",
      """select doc_id, len(string_split(text,' ')) ws_tokens,
 len(regexp_extract_all(text, '[a-zA-Z]+')) alpha_tokens,
 len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) bpe_ish,
 length(text) n_chars from documents order by doc_id limit 300"""),

    q2("q53_fingerprint",
      """with s as (select doc_id, explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents),
 fp as (select doc_id, min(substr(md5(sh),1,16)) shingle_fp, count(distinct sh) n_shingles from s group by doc_id)
 select d.doc_id, md5(d.text) doc_fp, f.shingle_fp, f.n_shingles
 from documents d join fp f on d.doc_id=f.doc_id order by d.doc_id limit 300""",
      """with s as (select doc_id, unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select doc_id, string_split(text,' ') l from documents) x),
 fp as (select doc_id, min(substr(md5(sh),1,16)) shingle_fp, count(distinct sh) n_shingles from s group by doc_id)
 select d.doc_id, md5(d.text) doc_fp, f.shingle_fp, f.n_shingles
 from documents d join fp f on d.doc_id=f.doc_id order by d.doc_id limit 300"""),

    q2("q54_minhash_sig",
      s"""with w as (${sparkTok("")})
 select doc_id, ${(1 to 4).map(mh).mkString(", ")}
 from w group by doc_id order by doc_id limit 300""",
      s"""with w as (${duckTok("")})
 select doc_id, ${(1 to 4).map(mh).mkString(", ")}
 from w group by doc_id order by doc_id limit 300"""),

    q2("q55_minhash_lsh",
      lshSql(sparkTok(" where doc_id < 200")),
      lshSql(duckTok(" where doc_id < 200"))),

    q2("q56_simhash",
      simhashSql(sparkTok(""), "explode(sequence(0,15))"),
      simhashSql(duckTok(""), "unnest(generate_series(0,15))")),

    q2("q57_charngram_jaccard",
      """with t as (select distinct doc_id, sh from (select doc_id,
   explode(transform(sequence(1, greatest(length(text)-2,1)), i -> substr(text, i, 3))) sh
   from documents where doc_id < 100) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.sh=b.sh and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.55 order by d1, d2 limit 200""",
      """with t as (select distinct doc_id, sh from (select doc_id,
   unnest(list_transform(generate_series(1, greatest(length(text)-2,1)), i -> text[i:i+2])) sh
   from (select doc_id, text from documents where doc_id < 100) y) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.sh=b.sh and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.55 order by d1, d2 limit 200"""),

    q2("q58_embedding_neardup", neardupSql(simOf), neardupSql(simDuckOf)),

    q2("q59_ann_ivf", ivfSql(simOf), ivfSql(simDuckOf)),

    q2("q60_ann_lsh",
      annLshSql(simOf, hyperSpark),
      annLshSql(simDuckOf, hyperDuck)),

    // ---- q61+: second wave of pipeline operators (round 2) ---------------

    q2("q61_tfidf",
      """with tok as (select doc_id, explode(split(text,' ')) w from documents),
 tf as (select doc_id, w, count(*) tf from tok group by doc_id, w),
 df as (select w, count(distinct doc_id) df from tf group by w),
 n as (select count(*) nd from documents)
 select doc_id, w, round(tf * ln(cast(nd as double)/df), 6) tfidf
 from tf join df using (w) cross join n
 order by tfidf desc, doc_id, w limit 100""",
      """with tok as (select doc_id, unnest(string_split(text,' ')) w from documents),
 tf as (select doc_id, w, count(*) tf from tok group by doc_id, w),
 df as (select w, count(distinct doc_id) df from tf group by w),
 n as (select count(*) nd from documents)
 select doc_id, w, round(tf * ln(cast(nd as double)/df), 6) tfidf
 from tf join df using (w) cross join n
 order by tfidf desc, doc_id, w limit 100"""),

    q2("q62_stopword_removal",
      s"""select doc_id, array_join(filter(split(text,' '), w -> not ($stopPred)), ' ') cleaned,
 size(split(text,' ')) - size(filter(split(text,' '), w -> not ($stopPred))) removed
 from documents order by doc_id limit 300""",
      s"""select doc_id, array_to_string(list_filter(string_split(text,' '), w -> not ($stopPred)), ' ') cleaned,
 len(string_split(text,' ')) - len(list_filter(string_split(text,' '), w -> not ($stopPred))) removed
 from documents order by doc_id limit 300"""),

    q2("q63_redaction",
      """select doc_id, regexp_count(text, '[0-9]+') n_num,
 regexp_replace(text, '[0-9]+', '<NUM>') redacted
 from documents order by doc_id limit 200""",
      """select doc_id, len(regexp_extract_all(text, '[0-9]+')) n_num,
 regexp_replace(text, '[0-9]+', '<NUM>', 'g') redacted
 from documents order by doc_id limit 200"""),

    q("q64_length_histogram",
      """select cast(floor(length(text)/100) as bigint) bucket, count(*) c,
 min(length(text)) mn, max(length(text)) mx
 from documents group by cast(floor(length(text)/100) as bigint) order by bucket"""),

    q2("q65_inverted_index",
      """with t as (select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents) x)
 select w, count(*) df, array_join(transform(sort_array(collect_list(doc_id)), x -> cast(x as string)), ',') docs
 from t group by w having count(*) >= 20 order by w limit 200""",
      """with t as (select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents) x)
 select w, count(*) df, array_to_string(list_sort(list(doc_id)), ',') docs
 from t group by w having count(*) >= 20 order by w limit 200"""),

    q2("q66_embedding_stats",
      """select vec_id,
 round(sqrt(aggregate(transform(embedding, x -> cast(x as double)*cast(x as double)), cast(0.0 as double), (a,x) -> a+x)), 6) l2,
 round(aggregate(embedding, cast(0.0 as double), (a,x) -> a+cast(x as double)) / size(embedding), 6) mean,
 round(cast(array_min(embedding) as double), 6) mn,
 round(cast(array_max(embedding) as double), 6) mx
 from embeddings order by vec_id limit 300""",
      """select vec_id,
 round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) l2,
 round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) mean,
 round(list_min(embedding)::DOUBLE, 6) mn,
 round(list_max(embedding)::DOUBLE, 6) mx
 from embeddings order by vec_id limit 300"""),

    q("q67_event_funnel",
      """select e1.user_id, count(distinct e2.event_id) conversions
 from events e1 join events e2
 on e1.user_id=e2.user_id and e2.ts > e1.ts and e2.ts <= e1.ts + interval 1 hour
 where e1.event_type='click' and e2.event_type='purchase'
 group by e1.user_id order by e1.user_id limit 200"""),

    q2("q68_pmi",
      """with tok as (select doc_id, pos, w from documents lateral view posexplode(split(text,' ')) t as pos, w),
 uni as (select w, count(*) c from tok group by w),
 big as (select t1.w w1, t2.w w2, count(*) cb from tok t1 join tok t2 on t1.doc_id=t2.doc_id and t2.pos=t1.pos+1 group by t1.w, t2.w),
 tot as (select count(*) n from tok),
 totb as (select sum(cb) nb from big)
 select concat(w1, ' ', w2) bg, cb,
  round(ln((cast(cb as double)/cast(nb as double)) /
   ((cast(u1.c as double)/cast(n as double)) * (cast(u2.c as double)/cast(n as double)))), 6) pmi
 from big join uni u1 on u1.w=big.w1 join uni u2 on u2.w=big.w2 cross join tot cross join totb
 where cb >= 5 order by pmi desc, bg limit 100""",
      """with tok as (select doc_id, generate_subscripts(l,1)-1 pos, unnest(l) w from (select doc_id, string_split(text,' ') l from documents) s),
 uni as (select w, count(*) c from tok group by w),
 big as (select t1.w w1, t2.w w2, count(*) cb from tok t1 join tok t2 on t1.doc_id=t2.doc_id and t2.pos=t1.pos+1 group by t1.w, t2.w),
 tot as (select count(*) n from tok),
 totb as (select sum(cb) nb from big)
 select concat(w1, ' ', w2) bg, cb,
  round(ln((cast(cb as double)/cast(nb as double)) /
   ((cast(u1.c as double)/cast(n as double)) * (cast(u2.c as double)/cast(n as double)))), 6) pmi
 from big join uni u1 on u1.w=big.w1 join uni u2 on u2.w=big.w2 cross join tot cross join totb
 where cb >= 5 order by pmi desc, bg limit 100"""),

    // Deterministic hash split: the stable train/test assignment every
    // training pipeline needs — md5-keyed so the same doc lands in the same
    // split on any engine, any run, any shard layout.
    q2("q69_stable_split",
      """with s as (select doc_id,
   case when substr(md5(concat('split:', cast(doc_id as string))), 1, 1) <= 'c' then 'train' else 'test' end split
 from documents)
 select split, count(*) c, min(doc_id) mn, max(doc_id) mx from s group by split order by split""",
      """with s as (select doc_id,
   case when substr(md5(concat('split:', cast(doc_id as varchar))), 1, 1) <= 'c' then 'train' else 'test' end split
 from documents)
 select split, count(*) c, min(doc_id) mn, max(doc_id) mx from s group by split order by split"""),

    // Token-distribution entropy per doc — the information-density quality
    // signal (template/spam docs score low). Shannon entropy in nats over
    // the doc's token frequencies; exact integer counts, ln at the end.
    q2("q70_token_entropy",
      """with tok as (select doc_id, explode(split(text,' ')) w from documents),
 cnt as (select doc_id, w, count(*) c from tok group by doc_id, w),
 n as (select doc_id, count(*) n from tok group by doc_id)
 select cnt.doc_id,
  round(-sum((cast(c as double)/cast(n.n as double)) * ln(cast(c as double)/cast(n.n as double))), 6) entropy,
  max(n.n) n_tok
 from cnt join n on n.doc_id=cnt.doc_id group by cnt.doc_id order by cnt.doc_id limit 300""",
      """with tok as (select doc_id, unnest(string_split(text,' ')) w from documents),
 cnt as (select doc_id, w, count(*) c from tok group by doc_id, w),
 n as (select doc_id, count(*) n from tok group by doc_id)
 select cnt.doc_id,
  round(-sum((cast(c as double)/cast(n.n as double)) * ln(cast(c as double)/cast(n.n as double))), 6) entropy,
  max(n.n) n_tok
 from cnt join n on n.doc_id=cnt.doc_id group by cnt.doc_id order by cnt.doc_id limit 300"""),

    // Dup-cluster size histogram over the exact-dedup groups: how much of
    // the corpus is template mass, at what multiplicity.
    q("q71_dup_cluster_stats",
      """with g as (select md5(substr(text,1,16)) h, count(*) c from documents group by md5(substr(text,1,16)))
 select c cluster_size, count(*) n_clusters, cast(c as bigint) * count(*) docs_covered
 from g group by c order by c"""),

    // Transitive closure of the near-dup relation: pairwise J>=0.8 matches
    // become dedup CLUSTERS. DIALECT SPLIT (H8): DuckDB runs the RECURSIVE
    // CTE below; Spark 4.1 rejects UNION (distinct) inside recursive CTEs
    // ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]) and UNION ALL cannot
    // terminate on a symmetric edge set, so on Spark this operator is the
    // iterative min-label propagation in DedupOps.connectedComponents (the
    // DF impl below) — the one declared query whose Spark-side lowering is
    // an iterative kernel rather than one SQL text. CorpusSqlSpec pins this:
    // it asserts the error class still fires, so a future Spark that lifts
    // the restriction flags the string for re-enabling.
    q2("q72_dup_components",
      dupComponentsSql(sparkTok(" where doc_id < 200")),
      dupComponentsSql(duckTok(" where doc_id < 200"))),

    // Retention cohorts: users bucketed by first-seen day, activity counted
    // per day offset — the engagement matrix behind every usage dashboard.
    q2("q73_retention_cohorts", q73Spark, q73Duck),

    // RFM segmentation: recency/frequency/monetary quartiles per customer
    // via percentile breakpoints (deterministic cross-engine: breakpoints
    // round to the 4dp grid before every comparison).
    q2("q74_rfm_segments", q74Spark, q74Duck),

    q2("q75_group_percentile",
      """select o_orderpriority, round(percentile(o_totalprice, 0.5),4) p50,
 round(percentile(o_totalprice, 0.9),4) p90, count(*) c
 from orders group by o_orderpriority order by o_orderpriority""",
      """select o_orderpriority, round(quantile_cont(o_totalprice, 0.5),4) p50,
 round(quantile_cont(o_totalprice, 0.9),4) p90, count(*) c
 from orders group by o_orderpriority order by o_orderpriority"""),

    // Scale path for q58: LSH-bucketed candidate generation + exact verify
    // (the q55-analogue for vectors). Approximation is BY DECLARATION — the
    // oracle computes the identical candidate set, so the hash gate is exact.
    // The 4×2-bit instance here is exactly what Ann.lshBitsFor picks at the
    // oracle scale (lshBitsFor(500) = 2); production corpora go through
    // Ann.neardupLshAuto, which adds bits with log2(n) so bucket population
    // (and thus candidate volume per row) stays constant.
    q2("q76_embedding_neardup_lsh",
      neardupLshSql(simOf, hyperSpark),
      neardupLshSql(simDuckOf, hyperDuck)),

    // Right outer join as a first-class declared query (q08 exercises left;
    // the preserved side here is the RIGHT input of the join).
    q("q77_join_right",
      """select c.c_custkey, count(o.o_orderkey) n from orders o
 right join customer c on o.o_custkey=c.c_custkey and o.o_totalprice > 400000
 group by c.c_custkey order by c.c_custkey limit 100"""),

    // Within-document repetition ratio: fraction of duplicate word 3-grams
    // (C4/Gopher-style boilerplate signal). Per-row HOFs, no shuffle.
    q2("q78_repetition_ratio",
      """select doc_id, cast(size(s) as bigint) n_ngrams,
 round(1.0 - cast(size(array_distinct(s)) as double) / size(s), 4) rep_ratio
 from (select doc_id, transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3))) s from documents) t
 order by doc_id limit 300""",
      """select doc_id, cast(len(s) as bigint) n_ngrams,
 round(1.0 - cast(len(list_distinct(s)) as double) / len(s), 4) rep_ratio
 from (select doc_id, list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' ')) s
  from (select doc_id, string_split(text,' ') l from documents) x) t
 order by doc_id limit 300"""),

    // Eval-set contamination: distinct 3-grams of the held-out docs
    // (doc_id < 10) matched against every corpus doc — the train/eval
    // overlap check every training pipeline runs. The probe side is tiny by
    // construction (broadcast in the DF impl); the corpus side joins on the
    // shingle without ever shuffling payloads.
    q2("q79_contamination",
      """with probe as (select distinct sh from (select explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents where doc_id < 10) p),
 corp as (select distinct doc_id, sh from (select doc_id, explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents where doc_id >= 10) c)
 select corp.doc_id, count(*) hits from corp join probe on corp.sh = probe.sh
 group by corp.doc_id order by hits desc, doc_id limit 200""",
      """with probe as (select distinct sh from (select unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select string_split(text,' ') l from documents where doc_id < 10) y) p),
 corp as (select distinct doc_id, sh from (select doc_id, unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select doc_id, string_split(text,' ') l from documents where doc_id >= 10) z) c)
 select corp.doc_id, count(*) hits from corp join probe on corp.sh = probe.sh
 group by corp.doc_id order by hits desc, doc_id limit 200"""),

    // Cross-modal curation join: quality-filtered documents joined to their
    // embedding rows (text table × vector table on id) — the shape every
    // "filter then embed" pipeline stage has.
    q2("q80_quality_embedding_join",
      """select d.doc_id,
 round(sqrt(aggregate(transform(e.embedding, x -> cast(x as double)*cast(x as double)), cast(0.0 as double), (a,x) -> a+x)), 6) l2
 from documents d join embeddings e on e.vec_id = d.doc_id
 where size(split(d.text,' ')) >= 30 and size(array_distinct(split(d.text,' '))) >= 15
 order by d.doc_id limit 200""",
      """select d.doc_id,
 round(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x))), 6) l2
 from documents d join embeddings e on e.vec_id = d.doc_id
 where len(string_split(d.text,' ')) >= 30 and len(list_distinct(string_split(d.text,' '))) >= 15
 order by d.doc_id limit 200"""),

    // Heavy hitters with EXACT counts: the vocabulary/boilerplate census
    // every corpus pipeline runs. The DF impl goes through a count-min
    // sketch prefilter (SketchOps.heavyHitters: one sketch pass, then the
    // shuffle carries only candidate rows) — exact by the sketch's
    // no-undercount property + exact recount, so this plain GROUP
    // BY/HAVING text is a true oracle for it.
    q2("q81_heavy_hitters",
      """select sh, count(*) c from (select explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents) g
 group by sh having count(*) >= 5 order by c desc, sh limit 200""",
      """select sh, count(*) c from (select unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select string_split(text,' ') l from documents) x) g
 group by sh having count(*) >= 5 order by c desc, sh limit 200"""),

    // Contaminated-doc ID set (the semi-join form of q79): which corpus
    // docs share ANY 3-gram with the held-out set. The DF impl is
    // SketchOps.bloomSemiJoin — Bloom prefilter cuts the corpus side
    // before the exchange, exact semi join on survivors kills the false
    // positives, so the result equals this sketch-free SQL exactly.
    q2("q82_bloom_contamination",
      """with probe as (select distinct sh from (select explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents where doc_id < 10) p),
 corp as (select distinct doc_id, sh from (select doc_id, explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents where doc_id >= 10) c)
 select distinct doc_id from corp where sh in (select sh from probe) order by doc_id limit 200""",
      """with probe as (select distinct sh from (select unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select string_split(text,' ') l from documents where doc_id < 10) y) p),
 corp as (select distinct doc_id, sh from (select doc_id, unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select doc_id, string_split(text,' ') l from documents where doc_id >= 10) z) c)
 select distinct doc_id from corp where sh in (select sh from probe) order by doc_id limit 200"""),

    // Distribution window functions (percent_rank / cume_dist / nth_value)
    // — the ranking family q16 doesn't cover. Exact rationals in double,
    // identical on both engines; round(,6) before the hash per H10.
    q("q83_window_distribution",
      """select o_custkey, o_orderkey,
 round(percent_rank() over w, 6) pr, round(cume_dist() over w, 6) cd,
 nth_value(o_orderkey, 2) over (partition by o_custkey order by o_totalprice desc, o_orderkey
   rows between unbounded preceding and unbounded following) second_key
 from orders window w as (partition by o_custkey order by o_totalprice desc, o_orderkey)
 order by o_custkey, o_orderkey limit 300"""),

    // Edit-distance (typo) near-dup over the DISTINCT-name vocabulary with
    // prefix blocking: dedupe to (name, count) first — the vocabulary is
    // orders of magnitude smaller than the corpus — then levenshtein only
    // within equal-4-char-prefix blocks (equi join on the block key).
    // Running the metric at the occurrence level is quadratic in block
    // population (measured: 25k-row blocks at 200k parts → billions of
    // pairs); at the name level the same blocks hold dozens of rows.
    q("q84_editdistance_blocked",
      """select n1.p_name a, n2.p_name b, cast(levenshtein(n1.p_name, n2.p_name) as bigint) d, n1.c c1, n2.c c2
 from (select p_name, count(*) c from part group by p_name) n1
 join (select p_name, count(*) c from part group by p_name) n2
 on substr(n1.p_name,1,4)=substr(n2.p_name,1,4) and n1.p_name < n2.p_name
 where levenshtein(n1.p_name, n2.p_name) <= 4
 order by a, b limit 200"""),

    // Per-source curation census: corpus composition by (source, lang) with
    // exact token/char totals — what a pipeline reports per ingest batch.
    // DuckDB sums of BIGINT go HUGEINT → cast back (driver-compare hazard).
    q2("q85_source_report",
      """select source, lang, count(*) n_docs,
 sum(cast(size(split(text,' ')) as bigint)) total_tokens, sum(n_chars) total_chars
 from documents group by source, lang order by source, lang""",
      """select source, lang, count(*) n_docs,
 cast(sum(cast(len(string_split(text,' ')) as bigint)) as bigint) total_tokens,
 cast(sum(n_chars) as bigint) total_chars
 from documents group by source, lang order by source, lang"""),

    // Lateral (correlated table subquery) top-1-per-key join; the DF impl
    // lowers it to a ranking window + join (WindowGroupLimit pushdown)
    // rather than a per-outer-row subquery.
    q("q86_lateral_top1",
      """select c.c_custkey, t.o_orderkey, t.o_totalprice from customer c
 join lateral (select o_orderkey, o_totalprice from orders o
   where o.o_custkey = c.c_custkey order by o_totalprice desc, o_orderkey limit 1) t on true
 order by c.c_custkey limit 200"""),

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) — q22 covers
    // only the distinct forms. Multiplicities summarized per group so the
    // output is deterministic without ordering individual duplicate rows.
    q("q87_set_ops_all",
      """select 'ia' op, v, count(*) c from (
 select o_orderpriority v from orders where o_orderstatus='F'
 intersect all
 select o_orderpriority v from orders where o_totalprice > 450000) t group by v
union all
select 'ea' op, v, count(*) c from (
 select o_orderpriority v from orders where o_orderstatus='F'
 except all
 select o_orderpriority v from orders where o_totalprice > 450000) t group by v
order by op, v"""),

    // Ordered string aggregation (listagg / string_agg) — deterministic via
    // the unique o_orderkey ordering inside the group.
    q2("q88_listagg",
      """select o_orderpriority, listagg(o_orderstatus, ',') within group (order by o_orderkey) s
 from orders where o_orderkey < 60 group by o_orderpriority order by o_orderpriority""",
      """select o_orderpriority, string_agg(o_orderstatus, ',' order by o_orderkey) s
 from orders where o_orderkey < 60 group by o_orderpriority order by o_orderpriority"""),

    // regexp_extract_all: every numeric run in the JSON props string,
    // joined (driver-compare array hazard — emit a string, not a list).
    q2("q89_regexp_extract_all",
      """select event_id, array_join(regexp_extract_all(props, '[0-9]+', 0), '|') nums
 from events order by event_id limit 100""",
      """select event_id, array_to_string(regexp_extract_all(props, '[0-9]+'), '|') nums
 from events order by event_id limit 100"""),

    // Time-series gap fill: per-user date spine × activity left join, zero
    // for silent days — the downsample/densify op every activity feed
    // needs. Spine days cast to timestamp (raw DATE renders differently
    // across engines); bare `d`/`day` aliases need AS in DuckDB (H8).
    q2("q90_gap_fill",
      """with spine as (select user_id, explode(sequence(date '2024-01-01', date '2024-01-14', interval 1 day)) as d
  from (select distinct user_id from events where user_id < 5) u),
 act as (select user_id, cast(date_trunc('day', ts) as date) as d, count(*) c from events group by 1,2)
select s.user_id, cast(s.d as timestamp) as dday, coalesce(a.c, 0) c
 from spine s left join act a on a.user_id = s.user_id and cast(a.d as timestamp) = cast(s.d as timestamp)
 order by s.user_id, dday""",
      """with spine as (select user_id, unnest(generate_series(date '2024-01-01', date '2024-01-14', interval 1 day)) AS d
  from (select distinct user_id from events where user_id < 5) u),
 act as (select user_id, cast(date_trunc('day', ts) as date) AS d, count(*) c from events group by 1,2)
select s.user_id, cast(s.d as timestamp) AS dday, coalesce(a.c, 0) c
 from spine s left join act a on a.user_id = s.user_id and cast(a.d as timestamp) = cast(s.d as timestamp)
 order by s.user_id, dday"""),

    // Cross-run incremental dedup: docs with doc_id < 150 are the PRIOR
    // corpus (persisted as a (sigkey, keep_id) fingerprint table between
    // runs); the rest are the new batch. The declared semantics is the
    // from-scratch union dedup restricted to the batch — which the engine's
    // incremental operator (DedupOps.incrementalDedup) reproduces from the
    // fingerprint table alone, never re-reading the prior corpus.
    q2("q91_incremental_dedup",
      incrementalDedupSql(sparkTok(""), "concat_ws('|', h1,h2,h3,h4,h5,h6,h7,h8)"),
      incrementalDedupSql(duckTok(""), "concat_ws('|', h1,h2,h3,h4,h5,h6,h7,h8)")),

    // C4-style span-level exact dedup: cut every document into fixed-width
    // 20-word spans and keep only the lexicographically-first occurrence of
    // each distinct span text across the corpus. The DECLARED keeper key is
    // the doc_id·1000 + span_no encoding — exactly lexicographic
    // (doc_id, span_no) order while span counts stay < 1000 (documents
    // under 20k words, which the fixture satisfies); the LIBRARY operator
    // (DedupOps.spanDedup) keeps min(struct(doc_id, span_no)) with no cap.
    // Finer-grained than q33's whole-document dedup: shared boilerplate
    // inside otherwise-distinct documents is caught at the span level.
    q2("q92_span_dedup",
      """with x as (select doc_id, split(text,' ') l from documents),
 sp as (select doc_id, l, explode(sequence(0, cast(floor((size(l)-1)/20.0) as int))) i from x),
 spans as (select doc_id, cast(i as bigint) span_no, concat_ws(' ', slice(l, i*20+1, 20)) span from sp),
 keeper as (select span, min(doc_id*1000+span_no) kk from spans group by span)
 select s.doc_id, s.span_no, cast(floor(kk/1000.0) as bigint) keep_doc, cast(kk % 1000 as bigint) keep_span,
  (s.doc_id*1000+s.span_no) <> kk is_dup
 from spans s join keeper k on s.span = k.span
 order by s.doc_id, s.span_no limit 500""",
      """with x as (select doc_id, string_split(text,' ') l from documents),
 sp as (select doc_id, l, unnest(generate_series(0, cast(floor((len(l)-1)/20.0) as int))) i from x),
 spans as (select doc_id, cast(i as bigint) span_no, array_to_string(l[i*20+1:i*20+20], ' ') span from sp),
 keeper as (select span, min(doc_id*1000+span_no) kk from spans group by span)
 select s.doc_id, s.span_no, cast(floor(kk/1000.0) as bigint) keep_doc, cast(kk % 1000 as bigint) keep_span,
  (s.doc_id*1000+s.span_no) <> kk is_dup
 from spans s join keeper k on s.span = k.span
 order by s.doc_id, s.span_no limit 500"""),

    // Linear-regression aggregate family (regr_slope/intercept/r2/count):
    // one-pass moment aggregates, map-side combined like any hash agg.
    // Ratios of large co-moments are rounded at 4 (absolute scale ~1e4) and
    // r2 at 6 (scale [0,1]) so double accumulation-order differences across
    // engines never reach the hash (H10 posture, same as q47's corr).
    q("q93_regr_stats",
      """select l_returnflag,
 round(regr_slope(cast(l_extendedprice as double), cast(l_quantity as double)),4) slope,
 round(regr_intercept(cast(l_extendedprice as double), cast(l_quantity as double)),4) icept,
 round(regr_r2(cast(l_extendedprice as double), cast(l_quantity as double)),6) r2,
 regr_count(cast(l_extendedprice as double), cast(l_quantity as double)) n
 from lineitem group by l_returnflag order by l_returnflag"""),

    // Gopher-style repetition/quality composite: top-word fraction (the
    // "fraction of the most common word" repetition rule — q78 is n-gram
    // repetition, this is the unigram form), word-count bounds, and mean
    // word length bounds folded into one keep/drop verdict. One explode +
    // two hash aggs; the per-doc scalars ride a broadcast-sized join back.
    q2("q94_gopher_filter",
      """with tok as (select doc_id, explode(split(text,' ')) w from documents),
 c as (select doc_id, w, count(*) c from tok group by doc_id, w),
 top as (select doc_id, max(c) top_c, sum(c) n_tok from c group by doc_id),
 m as (select doc_id, round(cast(length(replace(text,' ','')) as double)/size(split(text,' ')),4) awl from documents)
 select m.doc_id, cast(t.n_tok as bigint) n_tok, round(cast(t.top_c as double)/t.n_tok, 4) top_frac, m.awl,
 case when t.n_tok between 50 and 100000 and m.awl between 3 and 10
      and cast(t.top_c as double)/t.n_tok <= 0.2 then 'keep' else 'drop' end verdict
 from m join top t on m.doc_id = t.doc_id
 order by m.doc_id limit 300""",
      """with tok as (select doc_id, unnest(string_split(text,' ')) w from documents),
 c as (select doc_id, w, count(*) c from tok group by doc_id, w),
 top as (select doc_id, max(c) top_c, sum(c) n_tok from c group by doc_id),
 m as (select doc_id, round(cast(length(replace(text,' ','')) as double)/len(string_split(text,' ')),4) awl from documents)
 select m.doc_id, cast(t.n_tok as bigint) n_tok, round(cast(t.top_c as double)/t.n_tok, 4) top_frac, m.awl,
 case when t.n_tok between 50 and 100000 and m.awl between 3 and 10
      and cast(t.top_c as double)/t.n_tok <= 0.2 then 'keep' else 'drop' end verdict
 from m join top t on m.doc_id = t.doc_id
 order by m.doc_id limit 300"""),

    // Last-observation-carried-forward (IGNORE NULLS analytic windows) —
    // the forward-fill twin of q90's gap fill: sensors report sparsely
    // (every third event blanked deterministically here), the window
    // carries the latest non-null reading forward per user. Same running
    // partition frame as q37's totals; no extra shuffle beyond it.
    q2("q95_locf",
      """with s as (select event_id, user_id, ts,
   case when event_id % 3 = 0 then null else round(value, 4) end v_sparse
 from events)
 select event_id, user_id, v_sparse,
 last_value(v_sparse, true) over (partition by user_id order by ts, event_id
   rows between unbounded preceding and current row) v_filled
 from s order by user_id, ts, event_id limit 300""",
      """with s as (select event_id, user_id, ts,
   case when event_id % 3 = 0 then null else round(value, 4) end v_sparse
 from events)
 select event_id, user_id, v_sparse,
 last_value(v_sparse ignore nulls) over (partition by user_id order by ts, event_id
   rows between unbounded preceding and current row) v_filled
 from s order by user_id, ts, event_id limit 300"""),

    // k-means recenter / IVF centroid update, element-wise: per-cluster
    // per-dimension mean over the q59 fixture clustering (cid = vec_id % 8).
    // Long rows (cid, pos, mean) instead of arrays — array outputs crash
    // the driver compare (H: ndarray cells), and per-dim rows are what the
    // recenter agg shuffles anyway. Spark posexplode is 0-based, DuckDB
    // generate_subscripts 1-based: aligned to 1-based here.
    q2("q96_centroids",
      """with x as (select vec_id % 8 cid, p, v from embeddings
   lateral view posexplode(embedding) t as p, v)
 select cid, cast(p + 1 as bigint) pos, round(avg(cast(v as double)), 6) m
 from x group by cid, p order by cid, pos limit 300""",
      """with x as (select vec_id % 8 cid, generate_subscripts(embedding, 1) pos, unnest(embedding) v from embeddings)
 select cid, cast(pos as bigint) pos, round(avg(cast(v as double)), 6) m
 from x group by cid, pos order by cid, pos limit 300"""),

    // UNPIVOT (wide → long, the inverse of q40's pivot): both engines
    // support the SQL clause with the same shape; values pre-cast to
    // double so the unpivoted column has one type (decimal outputs are
    // driver-compare-hostile, H2).
    q("q97_unpivot",
      """select l_orderkey, l_linenumber, k, round(cast(v as double), 4) v
 from (select l_orderkey, l_linenumber, cast(l_quantity as double) quantity,
        cast(l_extendedprice as double) extendedprice, cast(l_discount as double) discount
      from lineitem) t
 unpivot (v for k in (quantity, extendedprice, discount))
 order by l_orderkey, l_linenumber, k, v limit 300"""),

    // Bitwise aggregate family (bit_and/bit_or/bit_xor): flag-mask rollups
    // (feature bitsets, permission masks) as one-pass mergeable aggs —
    // same text in both engines.
    q("q98_bitagg",
      """select l_returnflag, bit_and(l_linenumber) ba, bit_or(l_linenumber) bo,
 bit_xor(l_linenumber) bx, bit_and(l_partkey) bp, bit_or(l_suppkey) bs
 from lineitem group by l_returnflag order by l_returnflag"""),

    // Map-type operations under a CANONICAL textual form (closes SURVEY
    // §2.2's "no cross-engine textual form" row): build a per-customer
    // status→count map, look a key up, and serialize the map as its
    // SORTED entry list joined to ONE STRING — deterministic in both
    // engines and driver-compare-safe (no ARRAY/MAP output columns, H2).
    // The Spark side exercises the real map surface (map_from_entries /
    // try_element_at / map_entries); DuckDB computes the same values
    // relationally — map SEMANTICS are declared, construction syntax is
    // dialect (hazard H16, SURVEY §2.5).
    q2("q99_map_ops",
      """with c as (select o_custkey, o_orderstatus st, count(*) cnt
       from orders group by o_custkey, o_orderstatus),
 m as (select o_custkey,
        map_from_entries(array_sort(collect_list(struct(st, cnt)))) mp
       from c group by o_custkey)
 select o_custkey,
  coalesce(try_element_at(mp, 'O'), cast(0 as bigint)) open_cnt,
  cast(size(mp) as bigint) n_statuses,
  array_join(transform(array_sort(map_entries(mp)),
    e -> concat(e.key, ':', cast(e.value as string))), ',') entries
 from m order by o_custkey limit 300""",
      """with c as (select o_custkey, o_orderstatus st, count(*) cnt
       from orders group by o_custkey, o_orderstatus)
 select o_custkey,
  coalesce(max(case when st = 'O' then cnt end), 0) open_cnt,
  count(*) n_statuses,
  string_agg(st || ':' || cast(cnt as varchar), ',' order by st) entries
 from c group by o_custkey order by o_custkey limit 300"""),

    // ntile bucketing + median: the quantile-binning shape every feature
    // pipeline runs (ntile PARTITIONED per nation — un-partitioned ntile
    // is the single-task scale killer PlanSpec sweeps against; order key
    // extended to unique c_custkey so bucket assignment is deterministic).
    // median over double in both engines; decimals cast first (H2).
    q("q100_ntile_median",
      """with d as (select c_nationkey, c_custkey, cast(c_acctbal as double) bal,
        ntile(4) over (partition by c_nationkey order by c_acctbal, c_custkey) q
       from customer)
 select c_nationkey, q, cast(count(*) as bigint) n,
  round(min(bal), 2) lo, round(max(bal), 2) hi,
  round(cast(median(bal) as double), 4) med
 from d group by c_nationkey, q order by c_nationkey, q"""),

    // Array set operations under the canonical sorted-joined render (same
    // H16 discipline as q99): intersection of consecutive documents' token
    // sets, count + sorted word list as ONE string. Spark exercises the
    // real array surface (array_intersect distinct semantics, array_sort,
    // array_join); DuckDB computes the same values relationally.
    q2("q101_array_setops",
      """with t as (select doc_id, split(text, ' ') w from documents where doc_id < 100),
 p as (select a.doc_id i, b.doc_id j,
        array_sort(array_intersect(a.w, b.w)) common
       from t a join t b on b.doc_id = a.doc_id + 1)
 select i, j, cast(size(common) as bigint) n_common,
  array_join(common, ' ') common
 from p where size(common) > 0 order by i limit 300""",
      """with t as (select doc_id, unnest(string_split(text, ' ')) w
       from documents where doc_id < 100),
 td as (select distinct doc_id, w from t),
 c as (select a.doc_id i, b.doc_id j, a.w
       from td a join td b on b.doc_id = a.doc_id + 1 and a.w = b.w)
 select i, j, cast(count(*) as bigint) n_common,
  string_agg(w, ' ' order by w) common
 from c group by i, j order by i limit 300"""),

    // grouping() flags: the rollup-NULL disambiguation q43–q45 sidestep
    // with coalesce — here the data column REALLY contains nulls
    // (nullif-derived), so '(null)' detail rows and subtotal rows collide
    // textually and only grouping() tells them apart. Same text both
    // engines; flags also make the ORDER BY unique.
    q("q102_grouping_flags",
      """with t as (select l_returnflag rf, nullif(l_linestatus, 'O') ls from lineitem)
 select coalesce(rf, '(total)') rf_g, coalesce(ls, '(null)') ls_g,
  cast(grouping(rf) as bigint) g_rf, cast(grouping(ls) as bigint) g_ls,
  cast(count(*) as bigint) c
 from t group by rollup(rf, ls)
 order by g_rf, g_ls, rf_g, ls_g"""),

    // ANSI-safe ingestion: try_cast absorbs malformed numerics as NULL in
    // both engines (under Spark 4's default ANSI mode a bare cast would
    // THROW and kill the job on one bad row — the 100 TB posture is
    // row-absent, never job-fatal), and `x / nullif(y, 0)` is THE
    // portable zero-safe division (Spark's try_divide has no DuckDB
    // twin; nullif makes the dividend NULL-poison instead of erroring).
    q("q103_safe_parse",
      """with t as (select p_partkey,
        case when p_partkey % 3 = 0 then cast(p_size as string)
             when p_partkey % 3 = 1 then concat(cast(p_size as string), 'x')
             else '' end raw,
        p_size, cast(p_retailprice as double) price
       from part)
 select p_partkey, raw,
  try_cast(raw as int) parsed,
  coalesce(try_cast(raw as int), -1) parsed_filled,
  round(price / nullif(p_size - 5, 0), 4) ratio
 from t order by p_partkey limit 300"""),

    // Calendar-week rollup: date_trunc('week') is ISO-Monday in BOTH
    // engines (same text); the day-difference is the one dialect split —
    // Spark datediff(end, start) vs DuckDB date_diff('day', start, end).
    // Weeks emitted as timestamps (raw DATE renders differently across
    // engines — §2.5 gotcha).
    q2("q104_week_rollup",
      """select date_trunc('week', ts) wk, event_type,
  cast(count(*) as bigint) c,
  cast(datediff(max(ts), min(ts)) as bigint) span_days
 from events group by date_trunc('week', ts), event_type
 order by wk, event_type limit 300""",
      """select date_trunc('week', ts) wk, event_type,
  cast(count(*) as bigint) c,
  cast(date_diff('day', min(ts), max(ts)) as bigint) span_days
 from events group by date_trunc('week', ts), event_type
 order by wk, event_type limit 300"""),

    // Deterministic EXACT-k per-stratum sample (Pipelines.sampleExactK):
    // rank by a seeded md5 of the id inside each stratum, keep the k
    // smallest — reservoir sampling a pipeline can REPRODUCE (no RNG
    // state; stable across runs/partitionings/retries, the q69 stable-
    // split contract). md5 hex and row_number agree across engines; the
    // id tie-break keeps ordering total.
    q("q105_sample_exact_k",
      """with r as (select source, doc_id,
        row_number() over (partition by source
          order by md5(concat('s0:', cast(doc_id as string))), doc_id) rk
       from documents)
 select source, doc_id from r where rk <= 7 order by source, doc_id"""),

    // Higher central moments from FIRST PRINCIPLES: Spark's skewness/
    // kurtosis are population-form while DuckDB's are bias-corrected
    // sample-form, so the built-ins can never hash-match — but the
    // moment algebra itself is engine-free: one tiny mean CTE
    // cross-joined back (broadcast at scale), then avg of powered
    // deviations. Same text in both engines. The near-zero outputs
    // (centered_mean is an FP residual of exact 0; a symmetric
    // distribution's skew hovers near 0) get `+ 0`: IEEE -0.0 + 0 = +0.0,
    // killing the engines' sign-of-zero render split (Spark's round
    // yields +0.0 where DuckDB's preserves -0.0 — hazard H17).
    q("q106_moments",
      """with t as (select cast(c_acctbal as double) bal from customer),
 s as (select avg(bal) mu from t)
 select cast(count(*) as bigint) n,
  round(avg(bal - mu), 4) + 0 centered_mean,
  round(avg(pow(bal - mu, 2)), 4) m2,
  round(avg(pow(bal - mu, 3)) / pow(avg(pow(bal - mu, 2)), 1.5), 6) + 0 skew_pop,
  round(avg(pow(bal - mu, 4)) / pow(avg(pow(bal - mu, 2)), 2) - 3, 6) kurt_excess
 from t, s"""),

    // Ordered-set aggregates: the ANSI WITHIN GROUP spelling parses in
    // both engines with interpolating percentile_cont semantics — the
    // syntax-level twin of q46's function-form percentiles.
    q("q107_within_group",
      """select o_orderpriority,
  round(percentile_cont(0.5) within group (order by cast(o_totalprice as double)), 4) p50,
  round(percentile_cont(0.9) within group (order by cast(o_totalprice as double)), 4) p90
 from orders group by o_orderpriority order by o_orderpriority"""),

    // Capture-group replacement: the REFERENCE dialect split — Spark
    // spells backreferences $1, DuckDB spells them \1 (same regex, same
    // semantics, different escape). Word-pair swap over part names.
    q2("q108_regex_backref",
      """select p_partkey,
  regexp_replace(p_name, '^(\\w+) (\\w+)', '$2 $1') swapped
 from part order by p_partkey limit 300""",
      """select p_partkey,
  regexp_replace(p_name, '^(\w+) (\w+)', '\2 \1') swapped
 from part order by p_partkey limit 300"""),

    // Array membership/overlap: the names split (arrays_overlap/
    // array_position vs list_has_any/list_position) but BOTH engines at
    // these versions return 0 for an absent element (newer DuckDB docs
    // say NULL — verified 0 here, so the declared canonical form is the
    // 0-for-absent convention, widths normalized to bigint: Spark emits
    // long, DuckDB int32).
    q2("q109_array_membership",
      """with t as (select doc_id, split(text, ' ') w from documents where doc_id < 200),
 p as (select a.doc_id i, b.doc_id j, a.w wa, b.w wb
       from t a join t b on b.doc_id = a.doc_id + 100)
 select i, j,
  arrays_overlap(wa, wb) as has_common,
  cast(array_position(wa, 'the') as bigint) the_pos,
  cast(size(wa) as bigint) n_a
 from p order by i""",
      """with t as (select doc_id, string_split(text, ' ') w from documents where doc_id < 200),
 p as (select a.doc_id i, b.doc_id j, a.w wa, b.w wb
       from t a join t b on b.doc_id = a.doc_id + 100)
 select i, j,
  list_has_any(wa, wb) as has_common,
  cast(list_position(wa, 'the') as bigint) the_pos,
  cast(len(wa) as bigint) n_a
 from p order by i"""),

    // Time-INTERVAL range frames — the sliding-lookback aggregate ("events
    // in the last hour per user") that q18's numeric RANGE frames can't
    // spell. Same text in both engines; the frame sum goes through
    // DECIMAL like q18's (frame-order double accumulation is not
    // guaranteed to associate identically across engines).
    q("q110_time_range_frames",
      """select event_id, user_id,
 cast(count(*) over (partition by user_id order by ts range between interval 1 hour preceding and current row) as bigint) c1h,
 round(cast(sum(cast(value as decimal(18,4))) over (partition by user_id order by ts range between interval 1 hour preceding and current row) as double), 4) s1h
 from events order by user_id, event_id limit 300"""),

    // Second string-function family beyond q23: translate / repeat /
    // left / right / split_part (1-based, both engines) / ANSI
    // position(... in ...) — all same text, widths to bigint (Spark
    // position is int, DuckDB bigint).
    q("q111_string_funcs2",
      """select p_partkey,
 translate(p_name, 'aeiou', '12345') tr,
 repeat(p_brand, 2) rp,
 left(p_name, 4) l4, right(p_name, 4) r4,
 split_part(p_name, ' ', 2) w2,
 cast(position('a' in p_name) as bigint) pos_a
 from part order by p_partkey limit 300"""),

    // POSITIONAL tokenization — explode with ordinality, the primitive
    // under every span/window-over-tokens op (q92 builds on it). Dialect
    // split: Spark LATERAL VIEW posexplode (0-based) vs DuckDB
    // unnest + generate_subscripts (1-based, shifted down).
    q2("q112_pos_explode",
      """select doc_id, cast(pos as bigint) pos, w
 from documents lateral view posexplode(split(text, ' ')) t as pos, w
 where doc_id < 50 order by doc_id, pos limit 500""",
      """select doc_id, cast(generate_subscripts(string_split(text,' '),1) - 1 as bigint) pos,
  unnest(string_split(text,' ')) w
 from documents where doc_id < 50 order by doc_id, pos limit 500"""),

    // NULL-SAFE equality join (ANSI IS NOT DISTINCT FROM — same text both
    // engines; Spark's <=> is the same operator): the join where NULL
    // keys MATCH each other instead of vanishing — the semantics every
    // dedup-on-nullable-key pipeline actually wants.
    q("q113_nullsafe_join",
      """with a as (select p_partkey, nullif(p_size, 5) sz from part where p_partkey < 100),
 b as (select p_partkey, nullif(p_size, 5) sz from part where p_partkey >= 100)
 select a.p_partkey ka, b.p_partkey kb
 from a join b on a.sz is not distinct from b.sz
 order by ka, kb limit 300"""),

    // Inline VALUES relation joined to a stored table — literal dimension
    // tables (label maps, config rows) without a file. Same text both
    // engines.
    q("q114_values_join",
      """select t.tag, r.r_name
 from (values (0,'alpha'),(1,'beta'),(2,'gamma')) t(rk, tag)
 join region r on r.r_regionkey = t.rk
 order by t.tag"""),

    // Calendar fields: doy/quarter agree textually, but DOW is a dialect
    // TRAP — Spark date_part('dow') is 1–7 with Sunday=1 (dayofweek)
    // while DuckDB is 0–6 with Sunday=0; the canonical form is the
    // 0-based convention (Spark side shifts down). Measured, not
    // documented anywhere loudly: 2026-08 verification.
    q2("q115_calendar_parts",
      """select o_orderkey,
 cast(date_part('dow', o_orderdate) - 1 as bigint) dow,
 cast(date_part('doy', o_orderdate) as bigint) doy,
 cast(date_part('quarter', o_orderdate) as bigint) q
 from orders order by o_orderkey limit 300""",
      """select o_orderkey,
 cast(date_part('dow', o_orderdate) as bigint) dow,
 cast(date_part('doy', o_orderdate) as bigint) doy,
 cast(date_part('quarter', o_orderdate) as bigint) q
 from orders order by o_orderkey limit 300"""),

    // Format-string round trip: the pattern LANGUAGE splits (JDK
    // yyyy/MM/dd vs strftime %Y/%m/%d) but the rendered text and the
    // parsed-back timestamp must agree exactly.
    q2("q116_format_parse",
      """with s as (select o_orderkey, date_format(o_orderdate, 'yyyy/MM/dd') txt from orders)
 select o_orderkey, txt, to_timestamp(txt, 'yyyy/MM/dd') back
 from s order by o_orderkey limit 300""",
      """with s as (select o_orderkey, strftime(o_orderdate, '%Y/%m/%d') txt from orders)
 select o_orderkey, txt, strptime(txt, '%Y/%m/%d') back
 from s order by o_orderkey limit 300"""),

    // RECURSIVE CTE, UNION ALL form with a strictly-monotone bound — the
    // shape Spark 4.1 does support (UNION-distinct recursion is rejected,
    // which is why q72's transitive closure stays an iterative kernel —
    // see CorpusSqlSpec). Same text both engines; the recursion feeds a
    // join to a stored table so the declared result exercises both the
    // fixpoint and the equi-join.
    q("q117_recursive_cte",
      """with recursive m(k) as (select 1 union all select k+1 from m where k < 12)
 select k, count(*) c from m join orders on extract(month from o_orderdate) = k
 group by k order by k"""),

    // greatest/least: both engines SKIP nulls (return the extreme of the
    // non-null arguments; all-null gives NULL) — verified identical, so
    // the nullif-fed columns declare that convention.
    q("q118_greatest_least",
      """select p_partkey,
 greatest(p_size, 10) g, least(p_size, 10) l,
 greatest(nullif(p_size,5), 0) gn,
 least(nullif(p_size,5), 999) ln
 from part order by p_partkey limit 300"""),

    // Scalar edit distance — same name, same DP definition, verified
    // equal (the q84 near-dup operator composes this inside prefix
    // blocks; here the scalar itself is declared).
    q("q119_levenshtein",
      """select a.p_partkey ka, b.p_partkey kb, levenshtein(a.p_name, b.p_name) d
 from part a join part b on b.p_partkey = a.p_partkey + 100
 order by ka limit 300"""),

    // Case-insensitive LIKE — same text both engines (q02/q23 cover
    // case-sensitive LIKE and case mapping separately).
    q("q120_ilike",
      """select p_partkey, p_name from part
 where p_name ilike '%WiDg%' order by p_partkey limit 300"""),

    // REGEX-delimited splitting (multi-char delimiter classes — the
    // tokenizer shape real text needs; q31's split is single-space).
    // Dialect split on the function name only: Spark split() IS
    // regex-based, DuckDB needs string_split_regex.
    q2("q121_regex_split",
      """select doc_id, cast(size(split(text, '[ ,.]+')) as bigint) n
 from documents order by doc_id limit 300""",
      """select doc_id, cast(len(string_split_regex(text, '[ ,.]+')) as bigint) n
 from documents order by doc_id limit 300"""),

    // Scalar Hamming distance via popcount-of-xor — the distance under
    // every simhash near-dup cut (q56 / native simhash16); bit_count is
    // shared, the xor spelling splits (^ vs xor()).
    q2("q122_hamming",
      """select p_partkey, cast(bit_count(p_partkey ^ cast(p_size as bigint)) as bigint) hd
 from part order by p_partkey limit 300""",
      """select p_partkey, cast(bit_count(xor(p_partkey, cast(p_size as bigint))) as bigint) hd
 from part order by p_partkey limit 300"""),

    // SUFFIX window frames (CURRENT ROW .. UNBOUNDED FOLLOWING and
    // 1 FOLLOWING ..): the reverse of q37's running totals — remaining-
    // backlog / lookahead-count shapes. Same text both engines; decimal
    // sum per the q18 discipline.
    q("q123_suffix_frames",
      """select o_orderkey, o_custkey,
 round(cast(sum(cast(o_totalprice as decimal(18,4))) over (partition by o_custkey order by o_orderdate, o_orderkey rows between current row and unbounded following) as double), 4) suffix_sum,
 cast(count(*) over (partition by o_custkey order by o_orderdate, o_orderkey rows between 1 following and unbounded following) as bigint) n_after
 from orders order by o_custkey, o_orderkey limit 300"""),

    // Epoch seconds: Spark unix_timestamp FLOORS the fractional second,
    // DuckDB epoch() keeps it and the bigint cast ROUNDS — off-by-one on
    // any ts with fraction ≥ .5 (measured). The canonical form floors.
    q2("q124_epoch_seconds",
      """select event_id, cast(unix_timestamp(ts) as bigint) es
 from events order by event_id limit 300""",
      """select event_id, cast(floor(epoch(ts)) as bigint) es
 from events order by event_id limit 300"""),

    // WINDOWED collection (trailing-3 event history per row) — the
    // sequence-feature shape session models train on. The frame makes
    // the list deterministic; rendered as ONE joined string per H2/H16.
    // Names split: collect_list/array_join vs list/array_to_string.
    q2("q125_window_collect",
      """select event_id, user_id,
 array_join(collect_list(event_type) over (partition by user_id order by ts, event_id rows between 2 preceding and current row), ',') last3
 from events order by user_id, event_id limit 300""",
      """select event_id, user_id,
 array_to_string(list(event_type) over (partition by user_id order by ts, event_id rows between 2 preceding and current row), ',') last3
 from events order by user_id, event_id limit 300"""),

    // DISTINCT ordered string agg (q88 is the non-distinct form). Spark's
    // collect_set cannot take an ORDER BY, so its canonical spelling is
    // sort-after-dedup (array_sort ∘ collect_set) vs DuckDB's native
    // string_agg(distinct ... order by) — same rendered string.
    q2("q126_distinct_string_agg",
      """select o_custkey, array_join(array_sort(collect_set(o_orderpriority)), ',') prios
 from orders group by o_custkey order by o_custkey limit 300""",
      """select o_custkey, string_agg(distinct o_orderpriority, ',' order by o_orderpriority) prios
 from orders group by o_custkey order by o_custkey limit 300"""),

    // Regex PREDICATE (find-anywhere semantics, unlike LIKE's full-match):
    // regexp_like vs regexp_matches, same RE2-ish class syntax.
    q2("q127_regex_predicate",
      """select doc_id from documents
 where regexp_like(text, 'qu[a-z]+') order by doc_id limit 300""",
      """select doc_id from documents
 where regexp_matches(text, 'qu[a-z]+') order by doc_id limit 300"""),

    // Integer arithmetic conventions on NEGATIVES, measured identical:
    // div/`//` both TRUNCATE toward zero (-100 div 7 = -14, not floor's
    // -15), % takes the dividend's sign (-2), and round() is
    // half-away-from-zero in both (round(-0.5) = -1, round(2.5) = 3).
    // The `+ 0` is the H17 sign-of-zero guard.
    q2("q128_int_arith",
      """select p_partkey,
 cast((p_partkey - 100) % 7 as bigint) md,
 cast((100 - p_partkey) div 7 as bigint) dv,
 round((p_size - 10) / 2.0, 0) + 0 rh
 from part order by p_partkey limit 300""",
      """select p_partkey,
 cast((p_partkey - 100) % 7 as bigint) md,
 cast((100 - p_partkey) // 7 as bigint) dv,
 round((p_size - 10) / 2.0, 0) + 0 rh
 from part order by p_partkey limit 300"""),

    // Array ZIP under the canonical joined render (H16): positional
    // pairing of two token streams, BOTH engines null-pad to the longer
    // array (verified — the '_' cells). Dialect: arrays_zip+transform
    // with struct fields vs list_zip+list_transform with 1-based
    // subscripts.
    q2("q129_array_zip",
      """with t as (select doc_id, split(text,' ') w from documents where doc_id < 100),
 p as (select a.doc_id i, a.w wa, b.w wb from t a join t b on b.doc_id = a.doc_id + 1)
 select i, array_join(transform(arrays_zip(wa, wb), x -> concat(coalesce(x.wa,'_'), ':', coalesce(x.wb,'_'))), ' ') pairs
 from p order by i limit 200""",
      """with t as (select doc_id, string_split(text,' ') w from documents where doc_id < 100),
 p as (select a.doc_id i, a.w wa, b.w wb from t a join t b on b.doc_id = a.doc_id + 1)
 select i, array_to_string(list_transform(list_zip(wa, wb), x -> concat(coalesce(x[1],'_'), ':', coalesce(x[2],'_'))), ' ') pairs
 from p order by i limit 200"""),

    // chr/ascii + ANSI trim forms (BOTH 'set' FROM / LEADING 'set' FROM
    // — character-SET strip, not substring). Same text both engines.
    q("q130_chr_trim",
      """select p_partkey, ascii(p_name) a1, chr(65 + cast(p_partkey % 26 as int)) ch,
 trim(both 'B#' from p_brand) tb, trim(leading 'abc' from p_name) lt
 from part order by p_partkey limit 300"""),

    // lead/lag with explicit OFFSET and DEFAULT (q17 declares the bare
    // 1-offset forms): the default fills the frame edge instead of NULL.
    // Same names, same semantics, verified identical.
    q("q131_lead_lag_default",
      """select event_id, user_id,
 lead(event_type, 2, 'END') over (partition by user_id order by ts, event_id) nx2,
 lag(value, 3, 0.0) over (partition by user_id order by ts, event_id) pv3
 from events order by user_id, event_id limit 300"""),

    // NULL ordering is a DIALECT TRAP (hazard H19): Spark defaults
    // ASC -> NULLS FIRST, DuckDB ASC -> NULLS LAST (measured) — the
    // canonical convention is to ALWAYS spell the qualifier. The LIMIT
    // makes placement observable through the kept row SET (~40 null
    // keys sort ahead of the 300-row cut only under NULLS FIRST).
    q("q132_null_ordering",
      """select p_partkey, nullif(p_size, 25) k
 from part order by nullif(p_size, 25) asc nulls first, p_partkey limit 300"""),

    // Three-valued logic: x NOT IN (..., NULL) is never TRUE — FALSE on
    // a match, NULL (unknown) otherwise, so a bare WHERE silently drops
    // every row. Declared as projected booleans beside the coalesce'd
    // safe form; ANSI semantics, identical in both engines.
    q("q133_not_in_null",
      """select p_partkey,
 p_size not in (5, 10, null) raw,
 coalesce(p_size not in (5, 10, null), true) safe,
 p_size not in (5, 10) plain
 from part order by p_partkey limit 300"""),

    // Cryptographic hash family: md5 is the shared spelling (the
    // corpus' portable hash primitive — q54 builds minhashes on it);
    // SHA-256 splits on the function name (sha2(x,256) vs sha256()).
    q2("q134_hash_funcs",
      """select p_partkey, md5(p_name) h1, sha2(p_name, 256) h2,
 cast(length(md5(p_brand)) as bigint) hl
 from part order by p_partkey limit 300""",
      """select p_partkey, md5(p_name) h1, sha256(p_name) h2,
 cast(length(md5(p_brand)) as bigint) hl
 from part order by p_partkey limit 300"""),

    // Integer sequence generation + slicing. HAZARD: Spark sequence(a,b)
    // auto-steps DOWNWARD when a > b where DuckDB generate_series returns
    // [] — the declared form keeps a <= b by construction. Slice
    // spellings differ (slice(arr,start,len) vs 1-based stop-inclusive
    // arr[a:b]); an out-of-range slice is [] in both, but DuckDB 1.0's
    // array_to_string([]) returns NULL where Spark's array_join([])
    // returns '' (round 6, measured — newer DuckDB returns '') — the
    // duck side coalesces so the render is version-stable.
    q2("q135_sequence_slice",
      """select p_partkey,
 array_join(transform(sequence(1, p_size % 6 + 1), x -> cast(x as string)), ',') seq,
 array_join(transform(slice(sequence(1, p_size % 6 + 1), 2, 3), x -> cast(x as string)), ',') sl
 from part order by p_partkey limit 300""",
      """select p_partkey,
 array_to_string(list_transform(generate_series(1, p_size % 6 + 1), x -> cast(x as string)), ',') seq,
 coalesce(array_to_string(list_transform((generate_series(1, p_size % 6 + 1))[2:4], x -> cast(x as string)), ','), '') sl
 from part order by p_partkey limit 300"""),

    // Scalar bit ops: shifts and masks share one spelling; XOR does not —
    // DuckDB's ^ is POWER (a silent semantic trap), its xor() is the
    // function form of Spark's ^ operator. q98 declares the aggregate
    // family, q122 the popcount composition; this is the scalar family.
    q2("q136_bit_shifts",
      """select p_partkey,
 cast(p_partkey << 3 as bigint) shl, cast(p_partkey >> 2 as bigint) shr,
 cast(p_partkey & 255 as bigint) mask, cast(p_partkey | 4096 as bigint) orr,
 cast(p_partkey ^ cast(p_size as bigint) as bigint) xr
 from part order by p_partkey limit 300""",
      """select p_partkey,
 cast(p_partkey << 3 as bigint) shl, cast(p_partkey >> 2 as bigint) shr,
 cast(p_partkey & 255 as bigint) mask, cast(p_partkey | 4096 as bigint) orr,
 cast(xor(p_partkey, cast(p_size as bigint)) as bigint) xr
 from part order by p_partkey limit 300"""),

    // End-of-month calendar arithmetic: month adds CLAMP to the last
    // valid day in both engines (Jan 31 + 1 month = Feb 29, measured
    // both directions). Spelling splits: add_months vs +/- INTERVAL.
    // Outputs cast to TIMESTAMP, not raw DATE — the house render rule
    // (q73): engines render bare dates differently in the compare.
    q2("q137_month_clamp",
      """select o_orderkey, cast(add_months(o_orderdate, 1) as timestamp) m1,
 cast(add_months(o_orderdate, -3) as timestamp) m3, cast(last_day(o_orderdate) as timestamp) ld
 from orders order by o_orderkey limit 300""",
      """select o_orderkey, cast(o_orderdate + interval 1 month as timestamp) m1,
 cast(o_orderdate - interval 3 month as timestamp) m3, cast(last_day(o_orderdate) as timestamp) ld
 from orders order by o_orderkey limit 300"""),

    // Padding + negative-start substring — verified SHARED conventions:
    // lpad/rpad pad or TRUNCATE to exactly n; a negative start counts
    // from the string end, clamping when it reaches past the front
    // (substring('abc',-6,4) = 'a' in both). Same text both engines.
    q("q138_pad_substr",
      """select p_partkey, lpad(cast(p_partkey as string), 8, '0') pk8,
 rpad(p_brand, 10, '.') br,
 substring(p_name, -6, 4) tail4, substring(p_name, -6) tail
 from part order by p_partkey limit 300"""),

    // Aggregates over EMPTY input: grouping-less aggregation returns
    // exactly ONE row — count 0, sum/min/avg NULL — in both engines
    // (a GROUP BY would instead return zero rows).
    q("q139_empty_agg",
      """select cast(count(*) as bigint) c, sum(l_quantity) s,
 min(l_shipdate) m, avg(l_extendedprice) a
 from lineitem where l_quantity > 1000000"""),

    // TYPED JSON parsing (round 6): one from_json against an explicit
    // schema replaces per-field get_json_object calls — nested struct
    // path, array index, and an ABSENT field (typed null, no error) in
    // one parse. DuckDB has no typed parse; its oracle is per-path
    // json_extract + casts (the q28 idiom, per path). The JSON document
    // is rendered from integer/string columns only — float rendering
    // differs between engines and must never pass through a JSON string.
    q2("q140_typed_json",
      """with j as (select event_id, props, concat('{"id":', cast(user_id as string),
 ',"tags":["', event_type, '","x"],"meta":{"d":', cast(event_id % 7 as string), '}}') js from events),
 p as (select event_id, props, from_json(js, 'id BIGINT, tags ARRAY<STRING>, meta STRUCT<d: BIGINT>, nope STRING') s from j)
select event_id, s.id jid, element_at(s.tags, 1) t0,
 cast(size(s.tags) as bigint) nt, s.meta.d md, s.nope missing,
 cast(get_json_object(props, '$.k') as int) pk
from p order by event_id limit 300""",
      """with j as (select event_id, props, concat('{"id":', cast(user_id as varchar),
 ',"tags":["', event_type, '","x"],"meta":{"d":', cast(event_id % 7 as varchar), '}}') js from events)
select event_id, cast(json_extract(js, '$.id') as bigint) jid,
 json_extract_string(js, '$.tags[0]') t0,
 cast(json_array_length(js, '$.tags') as bigint) nt,
 cast(json_extract(js, '$.meta.d') as bigint) md,
 json_extract_string(js, '$.nope') missing,
 cast(json_extract(props, '$.k') as integer) pk
from j order by event_id limit 300"""),

    // OUTER positional explode (round 6): q112's H8 sibling for arrays
    // that can be EMPTY — posexplode_outer keeps the parent row with a
    // (NULL, NULL) child where inner explode DROPS it (the silent
    // row-loss bug in any explode-then-rejoin pipeline). DuckDB has no
    // outer unnest spelling; its oracle is LEFT JOIN LATERAL over the
    // unnest subquery (probed: the empty array yields one NULL row).
    // The nullable pos in the ORDER BY forces the H19 discipline — the
    // qualifier is spelled in BOTH engines or the LIMIT keeps different
    // row SETS.
    q2("q141_explode_outer",
      """select p_partkey, cast(pos as bigint) pos, w
 from (select p_partkey, filter(split(p_name, ' '), x -> length(x) > 5) ws from part) s
 lateral view outer posexplode(ws) t as pos, w
 order by p_partkey, pos asc nulls first limit 300""",
      """select s.p_partkey, cast(u.pos - 1 as bigint) pos, u.w
 from (select p_partkey, list_filter(string_split(p_name, ' '), x -> length(x) > 5) ws from part) s
 left join lateral (select unnest(s.ws) w, generate_subscripts(s.ws, 1) pos) u on true
 order by p_partkey, pos asc nulls first limit 300"""),

    // mode() + count_if (round 6): the statistical-mode aggregate shares
    // name and semantics (declared on a column whose max count is UNIQUE
    // at both scales — a tie would be impl-ordered in each engine), and
    // count_if is the shared named form of q49's FILTER counting.
    q("q142_mode_countif",
      """select mode(o_orderpriority) m,
 cast(count_if(o_totalprice > 150000) as bigint) big,
 cast(count(*) - count_if(o_totalprice > 150000) as bigint) rest
 from orders"""),

    // nth_value (round 6): q17's analytic family lacks the general n-th.
    // BOTH frame hazards are pinned by spelling them out: nth_value reads
    // from the FRAME, and the default RANGE..CURRENT ROW frame would make
    // row 1's nth_value(…,3) NULL; the explicit full frame gives every
    // row the partition's 3rd. The window ORDER BY carries a unique
    // tiebreak (H6) or the n-th element is engine-ordered.
    q("q143_nth_value",
      """select o_orderkey, o_custkey,
 nth_value(o_totalprice, 3) over (partition by o_custkey order by o_orderdate, o_orderkey
  rows between unbounded preceding and unbounded following) third,
 nth_value(o_orderkey, 1) over (partition by o_custkey order by o_orderdate, o_orderkey
  rows between unbounded preceding and unbounded following) firstk
 from orders order by o_orderkey limit 300"""),

    // GROUP BY ALL (round 6): both engines infer the grouping set from
    // the non-aggregate select items — same text, same inference rule
    // (every non-aggregate expression groups). The modern exploratory
    // spelling; the declared output is plain q03-family shape.
    q("q144_group_by_all",
      """select o_orderstatus, o_orderpriority, cast(count(*) as bigint) c,
 round(cast(sum(cast(o_totalprice as decimal(18,4))) as double), 4) s
 from orders group by all order by o_orderstatus, o_orderpriority"""),

    // Arrays-of-structs explode (round 6): the conversation-turns /
    // key-value-pairs shape — zip two arrays into structs, explode, and
    // project the fields flat (structs NEVER reach the output: H16's
    // render discipline). Spark spells it inline(arrays_zip(..)) under
    // LATERAL VIEW with field aliases; DuckDB unnests the list_zip and
    // extracts by NUMERIC index (its zip structs are unnamed). The zip
    // null-PADS to the longer side (q129's convention), observable here
    // as the (null, 3) row every 2-word name produces.
    q2("q145_inline_structs",
      """select p_partkey, t.a, cast(t.b as bigint) b
 from (select p_partkey, arrays_zip(split(p_name, ' '), array(1, 2, 3)) zs from part) s
 lateral view inline(zs) t as a, b
 order by p_partkey, b asc nulls first limit 300""",
      """select s.p_partkey, u.z[1] a, cast(u.z[2] as bigint) b
 from (select p_partkey, list_zip(string_split(p_name, ' '), [1, 2, 3]) zs from part) s,
 lateral (select unnest(s.zs) z) u
 order by p_partkey, b asc nulls first limit 300"""),

    // Calendar-distance conventions (round 6): month/year distances have
    // TWO conventions and the engines' builtins picked OPPOSITE ones —
    // measured: Spark timestampdiff(MONTH, Jan31, Feb1) = 0 (FULL
    // intervals elapsed) while DuckDB date_diff('month', ...) = 1
    // (BOUNDARY crossings); same split at YEAR. Neither builtin can be
    // translated to the other blindly. The declared form pins the
    // BOUNDARY convention via explicit shared arithmetic (year/month
    // extraction), exercised in both directions; day-level distance
    // (where the engines agree) is q25/q38's datediff family.
    q2("q146_calendar_distance",
      """select o_orderkey,
 cast((year(df) - year(o_orderdate)) * 12 + (month(df) - month(o_orderdate)) as bigint) bm_fwd,
 cast(year(df) - year(o_orderdate) as bigint) by_fwd,
 cast((year(o_orderdate) - year(db)) * 12 + (month(o_orderdate) - month(db)) as bigint) bm_back
 from (select o_orderkey, cast(o_orderdate as date) o_orderdate,
   date_add(cast(o_orderdate as date), 45) df,
   date_add(cast(o_orderdate as date), -100) db from orders) s
 order by o_orderkey limit 300""",
      """select o_orderkey,
 cast((year(df) - year(o_orderdate)) * 12 + (month(df) - month(o_orderdate)) as bigint) bm_fwd,
 cast(year(df) - year(o_orderdate) as bigint) by_fwd,
 cast((year(o_orderdate) - year(db)) * 12 + (month(o_orderdate) - month(db)) as bigint) bm_back
 from (select o_orderkey, cast(o_orderdate as date) o_orderdate,
   cast(o_orderdate as date) + 45 df,
   cast(o_orderdate as date) - 100 db from orders) s
 order by o_orderkey limit 300"""),

    // DISCRETE percentiles (round 6): percentile_disc picks an ACTUAL
    // element (the first whose cumulative distribution reaches the
    // fraction) where q46/q107's percentile_cont interpolates a value
    // that may exist in no row — the distribution-summary convention
    // split, under the shared ANSI WITHIN GROUP spelling (measured
    // value-identical both engines). Rounding is inert here (elements
    // are exact fixture values) but kept per the H2/H3 house render.
    q("q147_percentile_disc",
      """select o_orderstatus,
 round(cast(percentile_disc(0.25) within group (order by o_totalprice) as double), 2) p25,
 round(cast(percentile_disc(0.5) within group (order by o_totalprice) as double), 2) p50,
 round(cast(percentile_disc(0.9) within group (order by o_totalprice) as double), 2) p90
 from orders group by o_orderstatus order by o_orderstatus"""),

    // Concatenation NULL conventions (round 6) — measured three ways:
    // `||` null-POISONS in both engines (ANSI), concat_ws SKIPS nulls in
    // both, but bare concat() SPLITS — Spark poisons, DuckDB skips
    // ('a'||NULL||'b' is NULL everywhere; concat('a',NULL,'b') is NULL in
    // Spark and 'ab' in DuckDB) — so portable SQL uses || or concat_ws
    // and NEVER bare concat over nullables. The declared forms are the
    // two agreeing spellings over a real nullable; same text both
    // engines.
    q("q148_concat_null",
      """select p_partkey,
 p_name || '-' || nullif(p_type, 'PROMO') pipe,
 concat_ws('/', p_name, nullif(p_type, 'PROMO'), p_type) ws
 from part order by p_partkey limit 300"""),

    // LIKE ESCAPE + safe element access (round 6). The ANSI escape
    // clause is textually shared (measured: '!'-escaped literal %
    // matches agree). Element access: Spark's try_element_at ≡ DuckDB's
    // brackets — BOTH return NULL out-of-bounds and index from the END
    // on negatives (measured) — while Spark's bare element_at THROWS
    // out-of-bounds under ANSI: the safe spelling is the portable one.
    q2("q149_like_escape_element",
      """select p_partkey,
 concat_ws('%', p_name, p_type) like '%!%PROMO' escape '!' m,
 try_element_at(split(p_name, ' '), -1) lastw,
 try_element_at(split(p_name, ' '), 5) oob
 from part order by p_partkey limit 300""",
      """select p_partkey,
 concat_ws('%', p_name, p_type) like '%!%PROMO' escape '!' m,
 (string_split(p_name, ' '))[-1] lastw,
 (string_split(p_name, ' '))[5] oob
 from part order by p_partkey limit 300"""),

    // Array quantifier HOFs (round 6): ∃/∀ over token arrays — the
    // any-flagged-token / all-tokens-valid gate every curation filter
    // runs. Spark has native exists/forall; DuckDB lowers them to
    // list_filter cardinality (∀ via the de-Morgan complement count —
    // NOT p matching nothing). Thresholds chosen so BOTH branches fire
    // in the hashed window (fixture token lengths reach exactly 8 — a
    // > 8 predicate would be constant-false and pin nothing). The
    // empty-array conventions (∃ false, ∀ true) are declared explicitly
    // over a slice-built [] — constant BY DESIGN, like q139's
    // empty-input aggregation row.
    q2("q150_array_quantifiers",
      """select doc_id,
 exists(split(text, ' '), w -> length(w) > 7) has_long,
 forall(split(text, ' '), w -> length(w) > 2) all_gt2,
 exists(slice(split(text, ' '), 2, 0), w -> length(w) > 0) ex_empty,
 forall(slice(split(text, ' '), 2, 0), w -> length(w) > 0) fa_empty
 from documents order by doc_id limit 300""",
      """select doc_id,
 len(list_filter(string_split(text, ' '), w -> length(w) > 7)) > 0 has_long,
 len(list_filter(string_split(text, ' '), w -> not (length(w) > 2))) = 0 all_gt2,
 len(list_filter((string_split(text, ' '))[2:1], w -> length(w) > 0)) > 0 ex_empty,
 len(list_filter((string_split(text, ' '))[2:1], w -> not (length(w) > 0))) = 0 fa_empty
 from documents order by doc_id limit 300"""),

    // to_json struct render (round 7): q140's inverse — typed struct /
    // array / nested struct → canonical JSON text, the manifest/metadata
    // emission every pipeline does daily. Both engines render compact
    // (no spaces), keys in struct declaration order, standard "/\
    // escaping (probed on DuckDB 1.0.0; the `esc` field pins it via
    // chr() so the SQL literal dialects can't diverge). NULL fields:
    // Spark DROPS them by default — ignoreNullFields=false declared
    // explicitly to match DuckDB's "opt":null, with both branches of
    // the CASE live in the hashed window. Ints only inside the document
    // (float rendering differs; the q140 discipline). `rt` closes the
    // loop: render → path-extract returns the original value.
    q2("q151_to_json_render",
      """select event_id,
 to_json(named_struct(
   'id', user_id,
   'tags', array(event_type, 'x'),
   'meta', named_struct('d', event_id % 7),
   'opt', case when event_id % 5 = 0 then cast(null as bigint) else event_id end,
   'esc', concat(event_type, chr(34), chr(92))),
   map('ignoreNullFields', 'false')) js,
 get_json_object(to_json(named_struct('id', user_id, 'tags', array(event_type))), '$.tags[0]') rt
 from events order by event_id limit 300""",
      """select event_id,
 cast(to_json(struct_pack(
   id := user_id,
   tags := [event_type, 'x'],
   meta := struct_pack(d := event_id % 7),
   opt := case when event_id % 5 = 0 then cast(null as bigint) else event_id end,
   esc := concat(event_type, chr(34), chr(92)))) as varchar) js,
 json_extract_string(to_json(struct_pack(id := user_id, tags := [event_type])), '$.tags[0]') rt
 from events order by event_id limit 300"""),

    // Binary <-> text transport (round 7): the manifest/JSON-embedding
    // problem — binary payloads (digests, small blobs) must cross text
    // boundaries losslessly. base64 and hex round trips declared over
    // md5 digests and utf-8 encoded strings; hex renders UPPERCASE in
    // both engines (md5() itself renders lowercase — both, q134).
    // Spark base64/unbase64/encode/decode vs DuckDB
    // to_base64/from_base64/encode/decode; `dec` is a DuckDB reserved
    // word — alias dtxt.
    q2("q152_binary_text",
      """select p_partkey,
 base64(unhex(md5(p_name))) b64,
 hex(unbase64(base64(unhex(md5(p_name))))) rt,
 hex(encode(p_brand, 'utf-8')) henc,
 decode(unhex(hex(encode(p_brand, 'utf-8'))), 'utf-8') dtxt
 from part order by p_partkey limit 300""",
      """select p_partkey,
 to_base64(unhex(md5(p_name))) b64,
 hex(from_base64(to_base64(unhex(md5(p_name))))) rt,
 hex(encode(p_brand)) henc,
 decode(unhex(hex(encode(p_brand)))) dtxt
 from part order by p_partkey limit 300"""),

    // width_bucket histogram binning (round 7): equal-width bucket
    // assignment — the histogram primitive under every distribution
    // report. DuckDB 1.0 has no width_bucket; its oracle is the exact
    // floor-arithmetic definition Spark's builtin computes
    // ((v-lo)/((hi-lo)/n), floored, +1), with the under/overflow
    // conventions declared: v < lo -> 0, v >= hi -> n+1. Bounds chosen
    // inside the price range so all three regimes fire (min ~1k < lo,
    // max ~500k >= hi), with an exactly-representable bucket width
    // (320000/10) so the floor boundary cannot split on float rounding.
    q2("q153_width_bucket",
      """select cast(width_bucket(cast(o_totalprice as double), 100000, 420000, 10) as bigint) bucket,
 count(*) c,
 round(cast(min(o_totalprice) as double), 2) mn,
 round(cast(max(o_totalprice) as double), 2) mx
 from orders group by width_bucket(cast(o_totalprice as double), 100000, 420000, 10)
 order by bucket""",
      """with v as (select cast(o_totalprice as double) v from orders),
 b as (select case when v < 100000 then 0 when v >= 420000 then 11
   else cast(floor((v - 100000) / ((420000 - 100000) / 10)) as bigint) + 1 end bucket, v from v)
 select cast(bucket as bigint) bucket, count(*) c,
 round(min(v), 2) mn, round(max(v), 2) mx
 from b group by bucket order by bucket"""),

    // Array surgery (round 7): position / remove / null-compact /
    // repeat — the token-list editing toolkit. Conventions declared:
    // Spark array_position returns 0 when absent, DuckDB list_position
    // NULL (coalesced to 0 — the agreeing form); array_remove lowers to
    // list_filter (null-free arrays by construction — list_filter's
    // <> drops nulls where array_remove keeps them); array_compact =
    // filter-not-null; array_repeat = transform over range; and the
    // EMPTY-ARRAY RENDER SPLIT: Spark array_join([]) = '' but DuckDB
    // array_to_string([]) = NULL, so the portable spelling coalesces.
    q2("q154_array_surgery",
      """with s as (select p_partkey, split(p_name, ' ') ws from part)
 select p_partkey,
 cast(array_position(ws, 'red') as bigint) pos_red,
 array_join(array_remove(ws, 'red'), ',') no_red,
 coalesce(array_join(array_compact(transform(ws, w -> case when length(w) > 5 then w end)), ','), '') longs,
 array_join(array_repeat(element_at(ws, 1), 3), ',') rep3
 from s order by p_partkey limit 300""",
      """with s as (select p_partkey, string_split(p_name, ' ') ws from part)
 select p_partkey,
 cast(coalesce(list_position(ws, 'red'), 0) as bigint) pos_red,
 array_to_string(list_filter(ws, w -> w <> 'red'), ',') no_red,
 coalesce(array_to_string(list_filter(list_transform(ws, w -> case when length(w) > 5 then w end), x -> x is not null), ','), '') longs,
 array_to_string(list_transform(range(3), x -> ws[1]), ',') rep3
 from s order by p_partkey limit 300"""),

    // Rounding and logarithm dialect traps (round 7). Bare `log(x)` is
    // UNTRANSLATABLE: Spark log(x) = ln, DuckDB log(x) = log10 — a
    // silent wrong-answer generator; the declared forms are the explicit
    // ln/log10/log2 names (shared semantics) and the two-arg
    // explicit-base log (argument order agrees). Rounding conventions
    // measured: round() is HALF-UP (away from zero) in BOTH engines;
    // banker's (half-to-even) exists under different names — Spark
    // bround ≡ DuckDB round_even (which REQUIRES the scale argument).
    // l_quantity is integral, so +0.5 makes exact .5 boundaries where
    // the two conventions visibly diverge on odd integers.
    q2("q155_rounding_log",
      """select l_orderkey, l_linenumber,
 cast(round(l_quantity + 0.5) as double) r_half,
 cast(bround(l_quantity + 0.5) as double) r_even,
 round(ln(l_extendedprice), 6) lnv,
 round(log10(l_extendedprice), 6) l10,
 round(log2(l_quantity + 1), 6) l2,
 round(log(3.0, l_quantity + 1), 6) lb
 from lineitem order by l_orderkey, l_linenumber limit 300""",
      """select l_orderkey, l_linenumber,
 cast(round(l_quantity + 0.5) as double) r_half,
 cast(round_even(l_quantity + 0.5, 0) as double) r_even,
 round(ln(l_extendedprice), 6) lnv,
 round(log10(l_extendedprice), 6) l10,
 round(log2(l_quantity + 1), 6) l2,
 round(log(3, l_quantity + 1), 6) lb
 from lineitem order by l_orderkey, l_linenumber limit 300"""),

    // Named string predicates (round 7): the everyday curation-filter
    // trio as FUNCTIONS (q02 declares the LIKE forms) — boolean columns,
    // both values live in the window (52/44/39 of 300 true). Spark
    // spells them startswith/endswith, DuckDB starts_with/ends_with;
    // contains is shared. LIKE-metacharacter inputs need no escaping
    // here — that hazard is q149's ESCAPE clause; these are pure
    // substring tests.
    q2("q156_string_predicates",
      """select p_partkey,
 contains(p_name, 'red') has_red,
 startswith(p_name, 'small') sw,
 endswith(p_name, 'bolt') ew
 from part order by p_partkey limit 300""",
      """select p_partkey,
 contains(p_name, 'red') has_red,
 starts_with(p_name, 'small') sw,
 ends_with(p_name, 'bolt') ew
 from part order by p_partkey limit 300"""),

    // Char-trigram LM quality scoring (round 7): the CCNet/Gopher-style
    // language-model filter END-TO-END in declared SQL — train gram
    // log-probabilities over the real docs, score an interleaved probe
    // of real docs and md5-hex gibberish twins (pid parity; both halves
    // in the hashed window, so score ordering AND the OOV column have
    // discriminating power — real ≈ -5.37 / oov 0, gibberish ≈ -12.6 /
    // oov ≥ 0.97 at sf0.01). OOV grams take the Laplace-style floor
    // ln(0.5/total), below every observed gram; probed 0.397 from the
    // 4-digit rounding boundary, so the engines' last-ulp ln difference
    // cannot flip the round (H2 discipline). `txt`, not `text`, inside
    // the probe CTE — DuckDB rejects the bare alias (a type name).
    // The operator form is TextOps.ngramModel/ngramScore (broadcast
    // join against the bounded vocabulary; no corpus-sized shuffle).
    q2("q157_ngram_lm",
      """with probe as (
  select doc_id * 2 pid, text txt from documents where doc_id < 500
  union all
  select doc_id * 2 + 1 pid, concat(md5(text), ' ', md5(reverse(text))) as txt from documents where doc_id < 500),
 cg as (
  select g gram from documents
  lateral view explode(transform(sequence(1, greatest(length(text) - 2, 1)), i -> substr(text, i, 3))) tt as g
  where length(g) = 3),
 dg as (
  select pid, g gram from probe
  lateral view explode(transform(sequence(1, greatest(length(txt) - 2, 1)), i -> substr(txt, i, 3))) tt as g
  where length(g) = 3),
 m0 as (select gram, count(*) c from cg group by gram having count(*) >= 2),
 t as (select sum(c) total from m0),
 m as (select gram, ln(c / (select total from t)) logp from m0)
select d.pid,
 cast(count(*) as bigint) n_grams,
 round(avg(coalesce(m.logp, ln(0.5 / (select total from t)))), 4) score,
 round(sum(case when m.logp is null then 1 else 0 end) / cast(count(*) as double), 4) oov
 from dg d left join m on d.gram = m.gram group by d.pid
 order by d.pid limit 300""",
      """with probe as (
  select doc_id * 2 pid, text txt from documents where doc_id < 500
  union all
  select doc_id * 2 + 1 pid, concat(md5(text), ' ', md5(reverse(text))) as txt from documents where doc_id < 500),
 cg as (
  select g gram from (
    select unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substr(text, i, 3))) g
    from documents) y
  where length(g) = 3),
 dg as (
  select pid, g gram from (
    select pid, unnest(list_transform(range(1, greatest(length(txt) - 2, 1) + 1), i -> substr(txt, i, 3))) g
    from probe) x
  where length(g) = 3),
 m0 as (select gram, count(*) c from cg group by gram having count(*) >= 2),
 t as (select sum(c) total from m0),
 m as (select gram, ln(c / (select total from t)) logp from m0)
select d.pid,
 cast(count(*) as bigint) n_grams,
 round(avg(coalesce(m.logp, ln(0.5 / (select total from t)))), 4) score,
 round(sum(case when m.logp is null then 1 else 0 end) / cast(count(*) as double), 4) oov
 from dg d left join m on d.gram = m.gram group by d.pid
 order by d.pid limit 300"""),

    // Day-of-week numbering conventions (round 7): every engine pair
    // disagrees here and the bug is silent. Measured: Spark dayofweek =
    // 1..7 SUNDAY-first; DuckDB dayofweek/dow = 0..6 Sunday-first
    // (shared NAME, off-by-one values — the trap); the portable
    // spelling is ISO Monday=1..Sunday=7, which Spark writes
    // weekday()+1 and DuckDB isodow(). dayofyear and weekofyear (ISO
    // week — Jan 1 can be week 52/53 of the PREVIOUS ISO year; both
    // engines agree because both are ISO) share names and semantics.
    q2("q158_dow_conventions",
      """select o_orderkey,
 cast(dayofweek(o_orderdate) as bigint) dw,
 cast(weekday(o_orderdate) + 1 as bigint) iso,
 cast(dayofyear(o_orderdate) as bigint) doy,
 cast(weekofyear(o_orderdate) as bigint) wk
 from orders order by o_orderkey limit 300""",
      """select o_orderkey,
 cast(dayofweek(o_orderdate) + 1 as bigint) dw,
 cast(isodow(o_orderdate) as bigint) iso,
 cast(dayofyear(o_orderdate) as bigint) doy,
 cast(weekofyear(o_orderdate) as bigint) wk
 from orders order by o_orderkey limit 300"""),

    // Division-by-zero conventions (round 7): bare x/0 is UNTRANSLATABLE
    // — Spark (ANSI, the engine default) THROWS DIVIDE_BY_ZERO where
    // DuckDB silently returns NULL; a query ported either direction
    // changes behavior without warning. Declared pairings: Spark
    // try_divide/try_mod ≡ DuckDB's native silent-NULL bare operators,
    // and the engine-portable spelling x / nullif(y, 0) (shared text,
    // NULL in both). Every third/fifth row divides by zero, so the NULL
    // convention is live in the hashed window.
    q2("q159_div_zero",
      """select o_orderkey,
 round(try_divide(o_totalprice, o_orderkey % 3), 4) safe_div,
 try_mod(o_orderkey, o_orderkey % 5) safe_mod,
 round(o_totalprice / nullif(o_orderkey % 3, 0), 4) portable_div
 from orders order by o_orderkey limit 300""",
      """select o_orderkey,
 round(o_totalprice / (o_orderkey % 3), 4) safe_div,
 o_orderkey % (o_orderkey % 5) safe_mod,
 round(o_totalprice / nullif(o_orderkey % 3, 0), 4) portable_div
 from orders order by o_orderkey limit 300"""),

    // Weighted multi-source mixture sampling (round 8): the data-mixing
    // step between curation and training. Accept iff the seeded md5
    // uniform of the doc id falls under the source's declared rate —
    // threshold = floor(rate·16^8) as zero-padded lowercase hex, a pure
    // string comparison both engines evaluate identically (rate 1.0 →
    // 'g', above every hex digit → whole source kept; sources outside
    // the spec get '00000000' → dropped). Exact membership is hashed
    // (the sampled rows themselves, not just counts), so any drift in
    // the acceptance rule or hash keying fails loudly.
    q2("q160_mix_sources",
      """select source, doc_id
 from documents
 where substr(md5(concat('mix:', cast(doc_id as string))), 1, 8) <
   case source when 'src0' then 'g' when 'src1' then '80000000'
     when 'src2' then '40000000' when 'src3' then '0ccccccc'
     else '00000000' end
 order by source, doc_id""",
      """select source, doc_id
 from documents
 where substr(md5(concat('mix:', cast(doc_id as varchar))), 1, 8) <
   case source when 'src0' then 'g' when 'src1' then '80000000'
     when 'src2' then '40000000' when 'src3' then '0ccccccc'
     else '00000000' end
 order by source, doc_id"""),

    // PII redaction classes (round 8): email/IPv4/phone on top of q63's
    // numeric runs. The fixture text carries no PII, so each row is
    // AUGMENTED with deterministic doc_id-derived PII of every class —
    // the counts and the redacted text then exercise each regex on every
    // row. Dialect traps pinned: Spark regexp_replace is global while
    // DuckDB needs the 'g' flag (q63's catalogued split), Spark SQL
    // string literals escape backslashes while DuckDB's are raw (q108's
    // split), and the regexes stay inside the Java-regex ∩ RE2 subset
    // (no lookaround/backrefs) so leftmost matching agrees. Application
    // order is semantic: email before ipv4 before phone (digit runs
    // inside the longer classes), mirrored by TextOps.piiPatterns.
    q2("q161_pii_redaction",
      """with a as (select doc_id,
   concat(text, ' contact u', cast(doc_id as string),
     '@mail.example.org or +1-555-', lpad(cast(doc_id % 1000 as string), 3, '0'),
     '-', lpad(cast((doc_id * 7) % 10000 as string), 4, '0'),
     ' at 192.168.', cast(doc_id % 256 as string), '.', cast((doc_id * 3) % 256 as string)) aug
  from documents)
 select doc_id,
 regexp_count(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') n_email,
 regexp_count(aug, '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b') n_ip,
 regexp_count(aug, '(\\+[0-9]{1,2}[ -])?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}') n_phone,
 regexp_replace(regexp_replace(regexp_replace(aug,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
   '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>'),
   '(\\+[0-9]{1,2}[ -])?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>') redacted
 from a order by doc_id limit 200""",
      """with a as (select doc_id,
   concat(text, ' contact u', cast(doc_id as varchar),
     '@mail.example.org or +1-555-', lpad(cast(doc_id % 1000 as varchar), 3, '0'),
     '-', lpad(cast((doc_id * 7) % 10000 as varchar), 4, '0'),
     ' at 192.168.', cast(doc_id % 256 as varchar), '.', cast((doc_id * 3) % 256 as varchar)) aug
  from documents)
 select doc_id,
 len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) n_email,
 len(regexp_extract_all(aug, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) n_ip,
 len(regexp_extract_all(aug, '(\+[0-9]{1,2}[ -])?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) n_phone,
 regexp_replace(regexp_replace(regexp_replace(aug,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
   '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
   '(\+[0-9]{1,2}[ -])?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') redacted
 from a order by doc_id limit 200"""),

    // Variable-width span dedup at NATURAL boundaries (round 8): segments
    // between ' the ' occurrences (the fixture carries no newlines; a
    // stopword boundary plays the paragraph separator's role), trimmed
    // with the SAME whitespace-regex trim the library uses (round 9 —
    // trim() strips only 0x20 and silently diverged on \t/\r edges;
    // DuckDB needs the 'g' flag for both anchors, Spark is global),
    // with a 10-char min-length floor — offset-invariant where q92's
    // fixed windows misalign. Same encoding-based keeper contract as q92
    // (identical to the library's struct min while span_no < 1000;
    // fixture max span_no = 7). 2 dup decisions live inside the hashed
    // window (probed), so the keeper arithmetic is exercised, not just
    // carried.
    q2("q162_boundary_span_dedup",
      """with segs as (select doc_id,
   filter(transform(split(text, ' the '), s -> regexp_replace(s, '^\\s+|\\s+$', '')), s -> length(s) >= 10) l
 from documents),
 spans as (select doc_id, cast(pos as bigint) span_no, s span
   from segs lateral view posexplode(l) t as pos, s),
 keeper as (select span, min(doc_id*1000+span_no) kk from spans group by span)
 select s.doc_id, s.span_no, cast(floor(kk/1000.0) as bigint) keep_doc, cast(kk % 1000 as bigint) keep_span,
  (s.doc_id*1000+s.span_no) <> kk is_dup
 from spans s join keeper k on s.span = k.span
 order by s.doc_id, s.span_no limit 500""",
      """with segs as (select doc_id,
   list_filter(list_transform(string_split(text, ' the '), s -> regexp_replace(s, '^\s+|\s+$', '', 'g')), s -> length(s) >= 10) l
 from documents),
 spans as (select doc_id, cast(generate_subscripts(l, 1) - 1 as bigint) span_no, unnest(l) span from segs),
 keeper as (select span, min(doc_id*1000+span_no) kk from spans group by span)
 select s.doc_id, s.span_no, cast(floor(kk/1000.0) as bigint) keep_doc, cast(kk % 1000 as bigint) keep_span,
  (s.doc_id*1000+s.span_no) <> kk is_dup
 from spans s join keeper k on s.span = k.span
 order by s.doc_id, s.span_no limit 500"""),

    // Training-sequence packing (round 8): the concatenate-and-chunk step
    // that turns curated documents into fixed-token-budget training
    // sequences. Per-source streams (a global pack order would be an
    // un-partitioned window — the posture the corpus bans), deterministic
    // doc_id order, budget 256: pack_id = which chunk the document STARTS
    // in (floor of the pre-document cumulative token offset / budget),
    // pack_off = offset within it, crosses = spans a chunk boundary.
    // The window frame is the portable cumsum-BEFORE spelling (rows
    // unbounded preceding → 1 preceding, first row NULL → coalesce 0).
    // 58 boundary-crossers and packs up to 5 live in the window (probed).
    q2("q163_sequence_packing",
      """with t as (select doc_id, source, cast(size(split(text, ' ')) as bigint) n_tok from documents),
 c as (select doc_id, source, n_tok,
   coalesce(sum(n_tok) over (partition by source order by doc_id rows between unbounded preceding and 1 preceding), 0) start_off
  from t)
 select doc_id, source, n_tok, cast(floor(start_off / 256.0) as bigint) pack_id,
  cast(start_off % 256 as bigint) pack_off,
  (start_off % 256) + n_tok > 256 crosses
 from c order by source, doc_id limit 300""",
      """with t as (select doc_id, source, cast(len(string_split(text, ' ')) as bigint) n_tok from documents),
 c as (select doc_id, source, n_tok,
   coalesce(sum(n_tok) over (partition by source order by doc_id rows between unbounded preceding and 1 preceding), 0) start_off
  from t)
 select doc_id, source, n_tok, cast(floor(start_off / 256.0) as bigint) pack_id,
  cast(start_off % 256 as bigint) pack_off,
  (start_off % 256) + n_tok > 256 crosses
 from c order by source, doc_id limit 300"""),

    // URL parsing conventions (round 8): host/path/query extraction — the
    // per-domain curation primitives (domain caps, source attribution,
    // boilerplate-by-site). Spark has the builtin `parse_url` (java.net
    // semantics: PROTOCOL/HOST lowercase-preserved, PATH keeps the
    // leading '/', QUERY drops the '?'); DuckDB 1.0 has no URL parser —
    // its oracle is the regexp definition of exactly those conventions,
    // which doubles as the portable spelling. The apex (registrable-ish)
    // domain is the last two host labels via a shared regexp on the
    // extracted host — the key a per-domain cap actually groups by.
    // URLs are doc_id-derived (two protocols, 5 subdomains × 3 apex
    // domains), so every convention fires on every row.
    q2("q164_url_parse",
      """with u as (select doc_id,
   concat(case when doc_id % 2 = 0 then 'https' else 'http' end, '://sub', cast(doc_id % 5 as string),
     '.example', cast(doc_id % 3 as string), '.org/p/', cast(doc_id as string), '/doc?q=', cast(doc_id % 7 as string), '&lang=en') url
  from documents)
 select doc_id, url,
  parse_url(url, 'PROTOCOL') proto,
  parse_url(url, 'HOST') host,
  parse_url(url, 'PATH') path,
  parse_url(url, 'QUERY') qs,
  regexp_extract(parse_url(url, 'HOST'), '([^.]+\\.[^.]+)$', 1) apex
 from u order by doc_id limit 300""",
      """with u as (select doc_id,
   concat(case when doc_id % 2 = 0 then 'https' else 'http' end, '://sub', cast(doc_id % 5 as varchar),
     '.example', cast(doc_id % 3 as varchar), '.org/p/', cast(doc_id as varchar), '/doc?q=', cast(doc_id % 7 as varchar), '&lang=en') url
  from documents)
 select doc_id, url,
  regexp_extract(url, '^([a-z]+)://', 1) proto,
  regexp_extract(url, '^[a-z]+://([^/]+)', 1) host,
  regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) path,
  regexp_extract(url, '\?(.*)$', 1) qs,
  regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '([^.]+\.[^.]+)$', 1) apex
 from u order by doc_id limit 300"""),

    // String indexing conventions (round 8), measured: `split_part`
    // agrees fully (1-based, NEGATIVE counts from the end, out-of-range
    // → '' — same in both engines); `position(x in y)`/`instr` agree;
    // the find-absent=0 convention agrees but the NAME splits (Spark
    // `locate(sub, s)` ≡ DuckDB `strpos(s, sub)` — argument order swaps
    // too); `left`/`right` agree on positive n but split SILENTLY on
    // negative (Spark returns '', DuckDB returns all-but-last/first n) —
    // the declared all-but-last form is the portable
    // `left(s, length(s) - n)` spelling, which is also what DuckDB's
    // negative left means; `translate` agrees.
    q2("q165_string_indexing",
      """select p_partkey,
 split_part(p_name, ' ', 2) sp2,
 split_part(p_name, ' ', -1) spneg,
 split_part(p_name, ' ', 50) spoor,
 cast(position('o' in p_name) as bigint) pos,
 cast(instr(p_name, 'al') as bigint) ins,
 cast(locate('zz', p_name) as bigint) loc,
 left(p_name, 4) l4, right(p_name, 4) r4,
 left(p_name, length(p_name) - 4) butlast,
 translate(p_name, 'aeiou', '01234') trans
 from part order by p_partkey limit 300""",
      """select p_partkey,
 split_part(p_name, ' ', 2) sp2,
 split_part(p_name, ' ', -1) spneg,
 split_part(p_name, ' ', 50) spoor,
 cast(position('o' in p_name) as bigint) pos,
 cast(instr(p_name, 'al') as bigint) ins,
 cast(strpos(p_name, 'zz') as bigint) loc,
 left(p_name, 4) l4, right(p_name, 4) r4,
 left(p_name, -4) butlast,
 translate(p_name, 'aeiou', '01234') trans
 from part order by p_partkey limit 300"""),

    // Multi-way weighted deterministic split (round 8): train/val/test at
    // 0.8/0.1/0.1 — the q69 binary split generalized to cumulative
    // hex-threshold intervals over the same seeded md5 draw (q160's
    // exact-to-2^-32 string comparison; thresholds floor(Σw·16^8):
    // 0.8 → cccccccc, 0.9 → e6666666; the last bucket is the
    // unconditional else so float cumulative error cannot orphan draws).
    // Exact membership hashed per row.
    q2("q166_split_weighted",
      """select doc_id,
 case when doc_id is null then null
      when substr(md5(concat('sp:', cast(doc_id as string))), 1, 8) < 'cccccccc' then 'train'
      when substr(md5(concat('sp:', cast(doc_id as string))), 1, 8) < 'e6666666' then 'val'
      else 'test' end split
 from documents order by doc_id limit 500""",
      """select doc_id,
 case when doc_id is null then null
      when substr(md5(concat('sp:', cast(doc_id as varchar))), 1, 8) < 'cccccccc' then 'train'
      when substr(md5(concat('sp:', cast(doc_id as varchar))), 1, 8) < 'e6666666' then 'val'
      else 'test' end split
 from documents order by doc_id limit 500"""),

    // BM25 ranking (round 8): the retrieval scorer (Okapi, +1-idf
    // variant so idf stays positive for common terms) over a fixed term
    // set — corpus search / relevance sampling as declared SQL. Shared
    // ANSI text modulo the explode/unnest split and ln (natural log in
    // both — the q155 bare-log trap does NOT apply to `ln`). Scores
    // rounded at 4dp; ties broken by doc_id.
    q2("q167_bm25",
      """with tok as (select doc_id, explode(split(text, ' ')) w from documents where doc_id is not null and text is not null),
 dl as (select doc_id, count(*) dl from tok group by doc_id),
 stats as (select count(*) n_docs, avg(dl) avgdl from dl),
 tf as (select doc_id, w, count(*) tf from tok where w in ('data','stream','sort') group by doc_id, w),
 df as (select w, count(distinct doc_id) df from tok where w in ('data','stream','sort') group by w),
 sc as (select t.doc_id,
   sum( ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) *
        (t.tf * 2.2) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) ) score
  from tf t join df d on t.w = d.w join dl l on l.doc_id = t.doc_id cross join stats s
  group by t.doc_id)
 select doc_id, round(score, 4) score from sc order by score desc, doc_id limit 100""",
      """with tok as (select doc_id, unnest(string_split(text, ' ')) w from documents where doc_id is not null and text is not null),
 dl as (select doc_id, count(*) dl from tok group by doc_id),
 stats as (select count(*) n_docs, avg(dl) avgdl from dl),
 tf as (select doc_id, w, count(*) tf from tok where w in ('data','stream','sort') group by doc_id, w),
 df as (select w, count(distinct doc_id) df from tok where w in ('data','stream','sort') group by w),
 sc as (select t.doc_id,
   sum( ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) *
        (t.tf * 2.2) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) ) score
  from tf t join df d on t.w = d.w join dl l on l.doc_id = t.doc_id cross join stats s
  group by t.doc_id)
 select doc_id, round(score, 4) score from sc order by score desc, doc_id limit 100"""),

    // Malformed-URL conventions (round 8, the q164 dirty-input half):
    // crawl URLs fail to parse, and the engines' degrade paths DIFFER —
    // Spark's ANSI parse_url THROWS (try_parse_url is the row-degrade
    // spelling, → NULL; measured: space-bearing text and missing-scheme
    // '://x' both NULL, any scheme parses), while the regexp definition
    // returns '' on no-match — the agreeing form wraps it in
    // nullif(·, ''). Every third row is well-formed, the rest malformed
    // two ways; the coalesced '<unparseable>' bucket is the grouping
    // key a crawl-balance cap actually uses.
    q2("q168_url_malformed",
      """with u as (select doc_id,
   case when doc_id % 3 = 0 then concat('https://h', cast(doc_id % 7 as string), '.example.org/p/', cast(doc_id as string))
        when doc_id % 3 = 1 then concat('not a url ', cast(doc_id as string))
        else concat('://missing-scheme/', cast(doc_id as string)) end url
  from documents)
 select doc_id, url,
  try_parse_url(url, 'HOST') host,
  coalesce(try_parse_url(url, 'HOST'), '<unparseable>') host_or
 from u order by doc_id limit 300""",
      """with u as (select doc_id,
   case when doc_id % 3 = 0 then concat('https://h', cast(doc_id % 7 as varchar), '.example.org/p/', cast(doc_id as varchar))
        when doc_id % 3 = 1 then concat('not a url ', cast(doc_id as varchar))
        else concat('://missing-scheme/', cast(doc_id as varchar)) end url
  from documents)
 select doc_id, url,
  nullif(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]+)', 1), '') host,
  coalesce(nullif(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]+)', 1), ''), '<unparseable>') host_or
 from u order by doc_id limit 300"""),

    // PageRank (round 8): the canonical multi-job MapReduce chain, as a
    // 3-iteration unrolled declared query — see q169Sql for the
    // integer-micro-rank contract that makes an iterative recurrence
    // hashable cross-engine. The library operator (GraphOps.pageRank)
    // runs the same integer math to any depth with dangling-mass
    // redistribution and checkpointed lineage.
    q2("q169_pagerank", q169Sql("string"), q169Sql("varchar")),

    // Personalized (teleport-set) PageRank — see q170Sql for the contract.
    q2("q170_ppr", q170Sql("string"), q170Sql("varchar")),

    // Label propagation (round 9) — see q171Sql for the determinism
    // contract. The library operator (GraphOps.labelPropagation) runs
    // the same sweep to any depth with isolated-node preservation.
    q2("q171_label_prop", q171Sql("string"), q171Sql("varchar")),

    // Triangle count (round 10) — see q172Sql for the graph construction
    // and the id-ordered oracle vs degree-ordered library split.
    q2("q172_triangles", q172Sql("string"), q172Sql("varchar")),

    // Local clustering coefficient (round 10) — q172 normalized; see
    // q173Sql for the single-division float-grid argument.
    q2("q173_clustering", q173Sql("string"), q173Sql("varchar")),

    // Charset / encoding conventions (round 12 — pins the conventions the
    // WARC front door relies on): latin-1 byte layout (é→E9, ±→B1),
    // UTF-16BE layout (ASCII → 00-interleaved), lossless latin-1 round
    // trip, and the U+FFFD invalid-byte replacement convention
    // (make_valid_utf8 / is_valid_utf8). DuckDB has no charset argument
    // on encode/decode (utf-8 only), so the oracle derives the same
    // bytes from documented equivalences: part columns are pure ASCII
    // (latin-1 ≡ utf-8 there), the non-ASCII suffix ' é±' contributes
    // fixed latin-1 bytes 20E9B1, UTF-16BE of ASCII is 00-interleaving,
    // and the replacement char is chr(65533).
    q2("q174_charset_conventions",
      """select p_partkey,
 hex(encode(concat(p_name, ' é±'), 'ISO-8859-1')) lat1,
 hex(encode(p_brand, 'UTF-16BE')) u16,
 decode(encode(concat(p_name, ' é±'), 'ISO-8859-1'), 'ISO-8859-1') rt,
 make_valid_utf8(cast(concat(encode(p_brand, 'utf-8'), unhex('80'), encode('!', 'utf-8')) as string)) fixed,
 is_valid_utf8(p_name) ok_ascii,
 is_valid_utf8(cast(concat(encode(p_brand, 'utf-8'), unhex('FF')) as string)) ok_broken
 from part order by p_partkey limit 300""",
      """select p_partkey,
 hex(encode(p_name)) || '20E9B1' AS lat1,
 regexp_replace(hex(encode(p_brand)), '(..)', '00\1', 'g') AS u16,
 p_name || ' é±' AS rt,
 p_brand || chr(65533) || '!' AS fixed,
 true AS ok_ascii,
 false AS ok_broken
 from part order by p_partkey limit 300"""),

    // Struct/array ORDER BY conventions (round 12): complex-typed sort
    // keys — the "order by (vector of features)" shape. Both engines
    // order arrays lexicographically element-wise with a shorter strict
    // prefix FIRST (empty least) and structs field-wise in declaration
    // order; ranks over both, derived from variable-length slices (0–3
    // elements) so the prefix convention actually fires, pin the whole
    // comparator cross-engine; ranks are PARTITIONED by p_brand (~80-row
    // groups — an un-partitioned window is the single-task scale killer
    // PlanSpec's corpus sweep forbids, and it caught this query's first
    // draft). Render discipline: ranks + a joined
    // string, never the array itself (driver pandas compare); the
    // empty-array render split (Spark '' vs DuckDB NULL, q154) is
    // coalesced on the DuckDB side.
    q2("q175_ordering_conventions",
      """select p_partkey,
 row_number() over (partition by p_brand order by arr, p_partkey) rn_arr,
 row_number() over (partition by p_brand order by st, p_partkey) rn_st,
 array_join(transform(arr, x -> cast(x as string)), ',') arr_s
 from (
 select p_partkey, p_brand,
  slice(array(p_size % 5, p_partkey % 7, length(p_name) % 6), 1, cast(p_partkey % 4 as int)) arr,
  struct(p_type, p_size % 3) st
 from part) t
 order by p_partkey limit 300""",
      """select p_partkey,
 row_number() over (partition by p_brand order by arr, p_partkey) AS rn_arr,
 row_number() over (partition by p_brand order by st, p_partkey) AS rn_st,
 coalesce(array_to_string(arr, ','), '') AS arr_s
 from (
 select p_partkey, p_brand,
  ([p_size % 5, p_partkey % 7, length(p_name) % 6])[1:(p_partkey % 4)] arr,
  row(p_type, p_size % 3) st
 from part) t
 order by p_partkey limit 300"""),

    // Interval arithmetic conventions (round 12): the dialect split is
    // pure spelling — Spark `make_interval(y,m,w,d,h,mi,s)` vs DuckDB
    // `INTERVAL (expr) UNIT` chains / `INTERVAL '1 month 3 days'` — while
    // the semantics agree exactly: day/hour/minute addition is plain
    // duration arithmetic (no TZ in play), month addition clamps to the
    // target month's last day (01-31 + 1 month = 02-29), and a COMBINED
    // month+day interval applies months (with clamp) FIRST, then days
    // (01-31 + '1 month 3 days' = 03-03, not 03-04) — both verified on
    // both engines. Timestamps emitted directly (q110 discipline).
    q2("q176_interval_arithmetic",
      """select o_orderkey,
 o_orderdate + make_interval(0, 0, 0, cast(o_orderkey % 40 as int), cast(o_orderkey % 23 as int), cast(o_orderkey % 59 as int), 0) plus_dhm,
 o_orderdate + make_interval(0, cast(o_orderkey % 14 as int)) plus_m,
 o_orderdate - make_interval(0, 0, 0, cast(o_orderkey % 11 as int)) minus_d,
 o_orderdate + make_interval(0, 1, 0, 3) plus_m_d
 from orders order by o_orderkey limit 300""",
      """select o_orderkey,
 o_orderdate + INTERVAL (o_orderkey % 40) DAY + INTERVAL (o_orderkey % 23) HOUR + INTERVAL (o_orderkey % 59) MINUTE AS plus_dhm,
 o_orderdate + INTERVAL (o_orderkey % 14) MONTH AS plus_m,
 o_orderdate - INTERVAL (o_orderkey % 11) DAY AS minus_d,
 o_orderdate + INTERVAL '1 month 3 days' AS plus_m_d
 from orders order by o_orderkey limit 300"""),

    // Date/timestamp sequence conventions (round 12, H23): day-stepped
    // series (unit + stride-2), descending series, and weekly timestamp
    // series agree engine-for-engine — inclusive stop, last element =
    // greatest step <= stop, singleton when stop = start. Month-STEPPED
    // sequences are the measured divergence: Spark `sequence(d1, d2,
    // interval 1 month)` adds k months to the START each element
    // (cumulative — Jan 31, Feb 29, MAR 31), DuckDB's generate_series
    // re-adds one month to the PREVIOUS element (iterative — Jan 31,
    // Feb 29, MAR 29); they part at the first month-end clamp and never
    // re-join. The portable monthly spine, declared here, is an integer
    // index series + add-k-months (Spark `add_months`, DuckDB
    // `to_months`) — cumulative by construction on both engines, clamp
    // semantics already pinned by q176. DuckDB's date-series elements
    // are TIMESTAMPs (cast back to date before rendering); Spark's are
    // DATEs.
    q2("q177_date_sequences",
      """select o_orderkey,
 array_join(transform(sequence(cast(o_orderdate as date), date_add(cast(o_orderdate as date), cast(o_orderkey % 6 as int)), interval 1 day), x -> cast(x as string)), ',') AS days,
 array_join(transform(sequence(cast(o_orderdate as date), date_add(cast(o_orderdate as date), 5), interval 2 day), x -> cast(x as string)), ',') AS stride,
 array_join(transform(sequence(cast(o_orderdate as date), date_sub(cast(o_orderdate as date), cast(o_orderkey % 4 as int)), interval -1 day), x -> cast(x as string)), ',') AS days_desc,
 array_join(transform(sequence(0, cast(o_orderkey % 5 as int)), k -> cast(add_months(cast(o_orderdate as date), k) as string)), ',') AS mspine,
 array_join(transform(sequence(o_orderdate, o_orderdate + make_interval(0,0,0,20), interval 7 day), x -> cast(x as string)), ',') AS weekly
 from orders order by o_orderkey limit 300""",
      """select o_orderkey,
 array_to_string(list_transform(generate_series(cast(o_orderdate as date), cast(o_orderdate as date) + to_days(cast(o_orderkey % 6 as int)), INTERVAL 1 DAY), x -> cast(cast(x as date) as varchar)), ',') AS days,
 array_to_string(list_transform(generate_series(cast(o_orderdate as date), cast(o_orderdate as date) + to_days(5), INTERVAL 2 DAY), x -> cast(cast(x as date) as varchar)), ',') AS stride,
 array_to_string(list_transform(generate_series(cast(o_orderdate as date), cast(o_orderdate as date) - to_days(cast(o_orderkey % 4 as int)), INTERVAL (-1) DAY), x -> cast(cast(x as date) as varchar)), ',') AS days_desc,
 array_to_string(list_transform(generate_series(0, o_orderkey % 5), k -> cast(cast(cast(o_orderdate as date) + to_months(cast(k as int)) as date) as varchar)), ',') AS mspine,
 array_to_string(list_transform(generate_series(o_orderdate, o_orderdate + to_days(20), INTERVAL 7 DAY), x -> cast(x as varchar)), ',') AS weekly
 from orders order by o_orderkey limit 300"""),

    // URL canonicalization conventions (round 12): the URL-level dedup
    // key a crawl pipeline applies before content dedup
    // (TextOps.canonicalizeUrl — the q168 parse family's constructive
    // half). Five variants of each logical URL: case-variant
    // scheme/host + default port + fragment + tracking params
    // (utm_*/gclid/fbclid/msclkid) all fold to one canonical form
    // (n_dups=3 proves the collision), while a scheme change (http) and
    // a NON-default port (:8443) stay distinct. Conventions pinned
    // cross-engine: fragment dropped, scheme+host lowercased (path case
    // kept), http:80/https:443 dropped, query params split on '&',
    // tracking/empty dropped, survivors byte-sorted and rejoined,
    // empty query dropped. Regexes are backslash-free (char classes
    // only) so both dialects share identical pattern strings; query
    // split runs on instr/strpos, not regex. Shape: pure projection +
    // one hash agg + an equi join back — no window, scales per-row.
    q2("q178_url_canonical",
      """with u as (select doc_id,
   case when doc_id % 5 = 0 then concat('https://H', cast(doc_id div 5 % 13 as string), '.Example.COM:443/Dir/', cast(doc_id div 5 as string), '?b=2&a=1')
        when doc_id % 5 = 1 then concat('HTTPS://h', cast(doc_id div 5 % 13 as string), '.example.com/Dir/', cast(doc_id div 5 as string), '?a=1&b=2&utm_campaign=spring#sec2')
        when doc_id % 5 = 2 then concat('https://h', cast(doc_id div 5 % 13 as string), '.EXAMPLE.com/Dir/', cast(doc_id div 5 as string), '?utm_source=feed&b=2&fbclid=XyZ&a=1')
        when doc_id % 5 = 3 then concat('http://h', cast(doc_id div 5 % 13 as string), '.example.com:80/Dir/', cast(doc_id div 5 as string), '?a=1&b=2')
        else concat('https://h', cast(doc_id div 5 % 13 as string), '.example.com:8443/Dir/', cast(doc_id div 5 as string), '?a=1&b=2') end url
  from documents),
 s1 as (select doc_id, url, regexp_replace(url, '#.*', '') nofrag from u),
 s2 as (select doc_id, url, lower(regexp_extract(nofrag, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) scheme,
   regexp_replace(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') rest from s1),
 s3 as (select *, regexp_extract(rest, '^([^/?]*)', 1) hostport from s2),
 s4 as (select *, lower(regexp_extract(hostport, '^([^:]*)', 1)) host,
   regexp_extract(hostport, ':([0-9]+)$', 1) port,
   substr(rest, length(hostport) + 1) pathq from s3),
 s5 as (select *,
   case when instr(pathq, '?') > 0 then substr(pathq, 1, instr(pathq, '?') - 1) else pathq end path,
   case when instr(pathq, '?') > 0 then substr(pathq, instr(pathq, '?') + 1) else '' end rawq from s4),
 s6 as (select *, array_join(array_sort(filter(split(rawq, '&'),
     p -> p <> '' and not (p rlike '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid)(=.*)?$'))), '&') q from s5),
 c as (select doc_id, url, concat(scheme, '://', host,
   case when port <> '' and not ((scheme = 'http' and port = '80') or (scheme = 'https' and port = '443')) then concat(':', port) else '' end,
   case when path = '' then '/' else path end,
   case when q <> '' then concat('?', q) else '' end) canon from s6),
 g as (select canon, count(*) n_dups from c group by canon)
 select c.doc_id, c.url, c.canon, g.n_dups from c join g on c.canon = g.canon
 order by c.doc_id limit 500""",
      """with u as (select doc_id,
   case when doc_id % 5 = 0 then concat('https://H', cast(doc_id // 5 % 13 as varchar), '.Example.COM:443/Dir/', cast(doc_id // 5 as varchar), '?b=2&a=1')
        when doc_id % 5 = 1 then concat('HTTPS://h', cast(doc_id // 5 % 13 as varchar), '.example.com/Dir/', cast(doc_id // 5 as varchar), '?a=1&b=2&utm_campaign=spring#sec2')
        when doc_id % 5 = 2 then concat('https://h', cast(doc_id // 5 % 13 as varchar), '.EXAMPLE.com/Dir/', cast(doc_id // 5 as varchar), '?utm_source=feed&b=2&fbclid=XyZ&a=1')
        when doc_id % 5 = 3 then concat('http://h', cast(doc_id // 5 % 13 as varchar), '.example.com:80/Dir/', cast(doc_id // 5 as varchar), '?a=1&b=2')
        else concat('https://h', cast(doc_id // 5 % 13 as varchar), '.example.com:8443/Dir/', cast(doc_id // 5 as varchar), '?a=1&b=2') end url
  from documents),
 s1 as (select doc_id, url, regexp_replace(url, '#.*', '') nofrag from u),
 s2 as (select doc_id, url, lower(regexp_extract(nofrag, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) scheme,
   regexp_replace(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') rest from s1),
 s3 as (select *, regexp_extract(rest, '^([^/?]*)', 1) hostport from s2),
 s4 as (select *, lower(regexp_extract(hostport, '^([^:]*)', 1)) host,
   regexp_extract(hostport, ':([0-9]+)$', 1) port,
   substr(rest, length(hostport) + 1) pathq from s3),
 s5 as (select *,
   case when strpos(pathq, '?') > 0 then substr(pathq, 1, strpos(pathq, '?') - 1) else pathq end path,
   case when strpos(pathq, '?') > 0 then substr(pathq, strpos(pathq, '?') + 1) else '' end rawq from s4),
 s6 as (select *, array_to_string(list_sort(list_filter(string_split(rawq, '&'),
     p -> p <> '' and not regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid)(=.*)?$'))), '&') q from s5),
 c as (select doc_id, url, concat(scheme, '://', host,
   case when port <> '' and not ((scheme = 'http' and port = '80') or (scheme = 'https' and port = '443')) then concat(':', port) else '' end,
   case when path = '' then '/' else path end,
   case when q <> '' then concat('?', q) else '' end) canon from s6),
 g as (select canon, count(*) n_dups from c group by canon)
 select c.doc_id, c.url, c.canon, g.n_dups from c join g on c.canon = g.canon
 order by c.doc_id limit 500"""),

    // C4-style line cleaning conventions (round 12): the published C4
    // recipe (TextOps.c4CleanLines/c4PageKeep) pinned cross-engine on a
    // synthetic page matrix that exercises every branch — terminal-punct
    // drop (nav bar), word-count drop ('ok.'), the 'javascript' word
    // drop vs the 'JavascriptX' boundary NON-drop (backslash-free
    // boundary class, identical pattern text in both dialects),
    // trim-before-test, and the page gates: sentence threshold (exactly
    // 7 is the even/%3 boundary row), '{' code-page kill, 'lorem ipsum'
    // kill (case-insensitive, on the RAW page — cleaning removes
    // neither). Cleaned lines join with ' / ' so no newline enters the
    // hashed cells. Shape: pure per-row projection, no shuffle.
    q2("q179_c4_lines",
      """with p as (select doc_id, concat_ws(chr(10),
   concat('Welcome to page ', cast(doc_id as string), '.'),
   'Home | About | Contact',
   'ok.',
   case when doc_id % 3 = 0 then 'This menu uses javascript to render.' else 'JavascriptX is a product name.' end,
   '   Padded and trimmed, fine.   ',
   case when doc_id % 2 = 0 then 'Is this a question? Yes it is.' else 'no terminal punctuation' end,
   'Final line stands here.',
   case when doc_id % 5 = 0 then 'Braces {inside} code.' else 'Tail sentence number five.' end,
   case when doc_id % 7 = 0 then 'Standard Lorem Ipsum placeholder text.' else 'One more closing sentence.' end) raw
  from documents where doc_id < 300),
 k as (select doc_id, raw, filter(transform(split(raw, chr(10)), l -> trim(l)),
   l -> l rlike '[.!?"]$' and size(split(l, ' +')) >= 3
    and not lower(l) rlike '(^|[^a-z0-9_])javascript([^a-z0-9_]|$)') kept from p),
 c as (select doc_id, raw, size(kept) n_kept, array_join(kept, ' / ') clean from k)
 select doc_id, n_kept, size(split(clean, '[.!?]')) - 1 AS n_sent,
  size(split(clean, '[.!?]')) - 1 >= 7
   and not contains(lower(raw), 'lorem ipsum')
   and not contains(raw, '{') AS keep,
  clean
 from c order by doc_id limit 300""",
      """with p as (select doc_id, concat_ws(chr(10),
   concat('Welcome to page ', cast(doc_id as varchar), '.'),
   'Home | About | Contact',
   'ok.',
   case when doc_id % 3 = 0 then 'This menu uses javascript to render.' else 'JavascriptX is a product name.' end,
   '   Padded and trimmed, fine.   ',
   case when doc_id % 2 = 0 then 'Is this a question? Yes it is.' else 'no terminal punctuation' end,
   'Final line stands here.',
   case when doc_id % 5 = 0 then 'Braces {inside} code.' else 'Tail sentence number five.' end,
   case when doc_id % 7 = 0 then 'Standard Lorem Ipsum placeholder text.' else 'One more closing sentence.' end) raw
  from documents where doc_id < 300),
 k as (select doc_id, raw, list_filter(list_transform(string_split(raw, chr(10)), l -> trim(l)),
   l -> regexp_matches(l, '[.!?"]$') and len(string_split_regex(l, ' +')) >= 3
    and not regexp_matches(lower(l), '(^|[^a-z0-9_])javascript([^a-z0-9_]|$)')) kept from p),
 c as (select doc_id, raw, len(kept) n_kept, array_to_string(kept, ' / ') clean from k)
 select doc_id, n_kept, len(string_split_regex(clean, '[.!?]')) - 1 AS n_sent,
  len(string_split_regex(clean, '[.!?]')) - 1 >= 7
   and not contains(lower(raw), 'lorem ipsum')
   and not contains(raw, '{') AS keep,
  clean
 from c order by doc_id limit 300"""),

    // Outlink-extraction conventions (round 12): the href-scraping subset
    // of the web-graph front door (Warc.extractHrefs → resolveUrl →
    // linkGraph), pinned cross-engine: both quote styles extract, the
    // REQUIRED &amp; entity spelling decodes before any filter, only
    // http(s) absolutes survive (relative and mailto drop), the fragment
    // cuts, and the scheme://host head lowercases while path/query case
    // keeps. The full RFC-3986 relative resolution is JVM-side
    // (WarcLinkSpec); this pins the pure-expression conventions both
    // engines can express. Backslash-free patterns shared verbatim.
    q2("q180_link_extract",
      """with h as (select doc_id, concat(
   '<a href="https://Site', cast(doc_id % 7 as string), '.ORG/Page?b=2&amp;a=1#s">x</a>',
   case when doc_id % 3 = 0 then concat('<a href=''http://alt', cast(doc_id % 5 as string), '.org/P''>y</a>')
        else '<a href="/relative/skip">y</a>' end,
   '<a href="mailto:a@b.org">z</a>') html
  from documents where doc_id < 300),
 e as (select doc_id, concat(
   regexp_extract_all(html, 'href="([^"]*)"', 1),
   regexp_extract_all(html, 'href=''([^'']*)''', 1)) hrefs from h),
 a as (select doc_id, size(hrefs) AS n_href,
   filter(transform(hrefs, u -> replace(u, '&amp;', '&')),
     u -> u rlike '^(http|https)://') abs from e),
 c as (select doc_id, n_href, size(abs) AS n_abs,
   transform(abs, u -> concat(
     lower(regexp_extract(regexp_replace(u, '#.*', ''), '^[^:]*://[^/?]*', 0)),
     substr(regexp_replace(u, '#.*', ''),
       length(regexp_extract(regexp_replace(u, '#.*', ''), '^[^:]*://[^/?]*', 0)) + 1))) canon
  from a)
 select doc_id, n_href, n_abs, array_join(array_sort(canon), ' ') AS links
 from c order by doc_id limit 300""",
      """with h as (select doc_id, concat(
   '<a href="https://Site', cast(doc_id % 7 as varchar), '.ORG/Page?b=2&amp;a=1#s">x</a>',
   case when doc_id % 3 = 0 then concat('<a href=''http://alt', cast(doc_id % 5 as varchar), '.org/P''>y</a>')
        else '<a href="/relative/skip">y</a>' end,
   '<a href="mailto:a@b.org">z</a>') html
  from documents where doc_id < 300),
 e as (select doc_id, list_concat(
   regexp_extract_all(html, 'href="([^"]*)"', 1),
   regexp_extract_all(html, 'href=''([^'']*)''', 1)) hrefs from h),
 a as (select doc_id, len(hrefs) AS n_href,
   list_filter(list_transform(hrefs, u -> replace(u, '&amp;', '&')),
     u -> regexp_matches(u, '^(http|https)://')) abs from e),
 c as (select doc_id, n_href, len(abs) AS n_abs,
   list_transform(abs, u -> concat(
     lower(regexp_extract(regexp_replace(u, '#.*', ''), '^[^:]*://[^/?]*', 0)),
     substr(regexp_replace(u, '#.*', ''),
       length(regexp_extract(regexp_replace(u, '#.*', ''), '^[^:]*://[^/?]*', 0)) + 1))) canon
  from a)
 select doc_id, n_href, n_abs, array_to_string(list_sort(canon), ' ') AS links
 from c order by doc_id limit 300"""),

    // Registered-domain conventions (round 12): the PSL-lite apex fold
    // (TextOps.registeredDomain) pinned cross-engine with the suffix
    // ALTERNATION INTERPOLATED FROM THE OP'S OWN LIST — one source of
    // truth, so a list edit re-pins the contract automatically. Branches:
    // multi-part suffix → 3 labels, plain TLD → 2, bare suffix / single
    // label → itself, case folds. Shared regex text (char classes +
    // non-capturing group — no backslashes), coalesce(nullif(...))
    // fallback chain identical in both dialects.
    q2("q181_registered_domain",
      s"""with h as (select doc_id, case
   when doc_id % 6 = 0 then concat('News.Sub', cast(doc_id as string), '.BBC.co.uk')
   when doc_id % 6 = 1 then concat('www.shop', cast(doc_id % 10 as string), '.com.au')
   when doc_id % 6 = 2 then concat('a.b.example', cast(doc_id % 10 as string), '.com')
   when doc_id % 6 = 3 then concat('example', cast(doc_id % 10 as string), '.org')
   when doc_id % 6 = 4 then 'localhost' else 'co.uk' end host
  from documents where doc_id < 300),
 r as (select doc_id, host, lower(host) lh from h)
 select doc_id, host,
  coalesce(nullif(regexp_extract(lh, '([^.]+[.](?:$pslAlt))$$', 1), ''),
           nullif(regexp_extract(lh, '([^.]+[.][^.]+)$$', 1), ''),
           lh) AS apex
 from r order by doc_id limit 300""",
      s"""with h as (select doc_id, case
   when doc_id % 6 = 0 then concat('News.Sub', cast(doc_id as varchar), '.BBC.co.uk')
   when doc_id % 6 = 1 then concat('www.shop', cast(doc_id % 10 as varchar), '.com.au')
   when doc_id % 6 = 2 then concat('a.b.example', cast(doc_id % 10 as varchar), '.com')
   when doc_id % 6 = 3 then concat('example', cast(doc_id % 10 as varchar), '.org')
   when doc_id % 6 = 4 then 'localhost' else 'co.uk' end host
  from documents where doc_id < 300),
 r as (select doc_id, host, lower(host) lh from h)
 select doc_id, host,
  coalesce(nullif(regexp_extract(lh, '([^.]+[.](?:$pslAlt))$$', 1), ''),
           nullif(regexp_extract(lh, '([^.]+[.][^.]+)$$', 1), ''),
           lh) AS apex
 from r order by doc_id limit 300"""),

    // Weighted PageRank (round 13) — see q182Sql for the multiplicity-
    // weight contract; the library operator (GraphOps.pageRankWeighted)
    // runs the same integer math to any depth.
    q2("q182_pagerank_weighted", q182Sql("string"), q182Sql("varchar")),

    // robots.txt glob semantics (round 13) — see q183Sql; the DF impl
    // runs Robots.matches itself, so op ≡ LIKE translation cross-engine.
    q2("q183_robots_glob", q183Sql("string"), q183Sql("varchar")),

    // HITS hubs/authorities (round 13) — see q184Sql for the exact
    // integer walk-count contract; the library operator (GraphOps.hits)
    // runs the L1-normalized form to any depth.
    q2("q184_hits", q184Sql("string"), q184Sql("varchar")),

    // Temperature mixing at α = 0.5 (round 13): the published n^α
    // low-resource-upweighting recipe (mT5/XLM-R) as per-stratum KEEP
    // rates over the q160 seeded-md5 acceptance machinery. Strata are
    // doc_id digit counts (10/90/400 — integer string length, exact on
    // any engine; the fixture's `source` census is deliberately uniform,
    // which would make every rate 1.0 and the query vacuous). The rate
    // math is IEEE-EXACT cross-engine by construction: rate =
    // sqrt(n_min)/sqrt(n) (sqrt and divide are correctly rounded — no
    // pow, whose last ulp is platform-defined), the threshold scales by
    // 16^8 = 2^32 (exact), floors (exact), and formats with C-style
    // %08x on both engines; the reference stratum compares n = min(n)
    // directly so its rate is exactly 1.0 → 'g' (the q160 clamp).
    // Exact sampled MEMBERSHIP is hashed, so drift in the rate
    // spelling, the threshold encoding, or the hash keying fails loudly.
    q2("q185_temperature_mix",
      """with d as (select concat('s', cast(length(cast(doc_id as string)) as string)) stratum, doc_id from documents),
 census as (select stratum, count(*) n from d group by stratum),
 rates as (select stratum,
   case when n = min(n) over () then cast(1.0 as double)
     else sqrt(cast(min(n) over () as double)) / sqrt(cast(n as double)) end rate
  from census),
 thr as (select stratum,
   case when rate >= 1.0 then 'g'
     else format_string('%08x', cast(floor(rate * 4294967296.0) as bigint)) end t
  from rates)
 select d.stratum, d.doc_id
 from d join thr on thr.stratum = d.stratum
 where substr(md5(concat('tmix:', cast(d.doc_id as string))), 1, 8) < t
 order by d.stratum, d.doc_id""",
      """with d as (select concat('s', cast(length(cast(doc_id as varchar)) as varchar)) stratum, doc_id from documents),
 census as (select stratum, count(*) n from d group by stratum),
 rates as (select stratum,
   case when n = min(n) over () then cast(1.0 as double)
     else sqrt(cast(min(n) over () as double)) / sqrt(cast(n as double)) end rate
  from census),
 thr as (select stratum,
   case when rate >= 1.0 then 'g'
     else printf('%08x', cast(floor(rate * 4294967296.0) as bigint)) end t
  from rates)
 select d.stratum, d.doc_id
 from d join thr on thr.stratum = d.stratum
 where substr(md5(concat('tmix:', cast(d.doc_id as varchar))), 1, 8) < t
 order by d.stratum, d.doc_id"""),

    // Token-budget sampling (round 13): training sets are sized in
    // TOKENS, not documents — keep the prefix of the seeded-md5 order
    // whose cumulative token count fits the budget. Everything is
    // engine-exact: integer token counts (the q167 split-cell length
    // convention — Spark split and DuckDB string_split both keep empty
    // cells), a lexicographic (hash, id) window order, and a bigint
    // running sum. The library twin (Pipelines.sampleToTokenBudget)
    // computes the SAME prefix with a bucketed two-pass plan (the
    // global window here is the oracle form — one partition — while
    // the op cuts 255/256 of rows without any window); PipelinesSpec
    // pins the two forms row-identical, and this query pins the
    // convention cross-engine.
    q2("q186_token_budget",
      """with t as (select doc_id,
   coalesce(size(split(text, ' ')), 0) n_tok,
   md5(concat('tb:', cast(doc_id as string))) h from documents),
 c as (select doc_id, n_tok, cast(sum(cast(n_tok as bigint)) over (order by h, doc_id
   rows between unbounded preceding and current row) as bigint) run from t)
 select doc_id, n_tok, run from c where run <= 20000 order by doc_id""",
      """with t as (select doc_id,
   coalesce(len(string_split(text, ' ')), 0) n_tok,
   md5(concat('tb:', cast(doc_id as varchar))) h from documents),
 c as (select doc_id, n_tok, cast(sum(cast(n_tok as bigint)) over (order by h, doc_id
   rows between unbounded preceding and current row) as bigint) run from t)
 select doc_id, n_tok, run from c where run <= 20000 order by doc_id"""),

    // Signed-edge-store netting (round 14): the streaming graph loops'
    // takedown store semantics under the hash gate. An integer action
    // log (pair, ±1 sign, batch id) nets in two steps — within-batch
    // ADD-WINS (max(sign) per (pair, batch): an upsert beats a removal,
    // the one-row-per-pair-per-batch store invariant), then
    // LAST-ACTION-WINS across batches (max_by(sign, b) — SET semantics,
    // not a sum: duplicate adds never need two removals) — and the
    // present pairs survive. All-integer, deterministic (max_by ties
    // impossible after the per-batch collapse), both engines have
    // max_by. The Spark twin runs the across-batch step through the
    // REAL kernel (SignedEdgeStore.net — the exact code ClusterLoop/
    // RankLoop/LabelLoop fold through).
    q2("q187_signed_netting",
      """with log as (select concat('a', cast(l_partkey % 50 as string)) lo,
   concat('b', cast(l_suppkey % 50 as string)) hi,
   case when cast(l_quantity as bigint) % 2 = 0 then 1 else -1 end sign,
   l_orderkey b from lineitem),
 batch as (select lo, hi, b, max(sign) sign from log group by lo, hi, b),
 net as (select lo, hi, max_by(sign, b) s from batch group by lo, hi)
 select lo, hi from net where s > 0 order by lo, hi""",
      """with log as (select concat('a', cast(l_partkey % 50 as varchar)) lo,
   concat('b', cast(l_suppkey % 50 as varchar)) hi,
   case when cast(l_quantity as bigint) % 2 = 0 then 1 else -1 end sign,
   l_orderkey b from lineitem),
 batch as (select lo, hi, b, max(sign) sign from log group by lo, hi, b),
 net as (select lo, hi, max_by(sign, b) s from batch group by lo, hi)
 select lo, hi from net where s > 0 order by lo, hi"""),

    // Map-merge conventions (round 14) under the H16 sorted-entries
    // render: per customer, TWO status→count maps (low/high order-value
    // halves, only statuses PRESENT in each half — collect_list skips
    // the null branch) merge ADDITIVELY with union-key semantics
    // (map_zip_with: a key missing on one side contributes 0), then
    // render as sorted `k:v` entries + a try_element_at probe. The
    // oracle computes the same merge relationally (the union of present
    // keys is exactly the customer's statuses, and the merged value is
    // the halves' sum); sums cast to bigint on both engines (DuckDB sum
    // is hugeint).
    q2("q188_map_merge",
      """with c as (select o_custkey, o_orderstatus st,
   cast(sum(case when o_totalprice < 150000 then 1 else 0 end) as bigint) lo_cnt,
   cast(sum(case when o_totalprice >= 150000 then 1 else 0 end) as bigint) hi_cnt
  from orders group by o_custkey, o_orderstatus),
 m as (select o_custkey,
   map_from_entries(array_sort(collect_list(case when lo_cnt > 0 then struct(st, lo_cnt) end))) m1,
   map_from_entries(array_sort(collect_list(case when hi_cnt > 0 then struct(st, hi_cnt) end))) m2
  from c group by o_custkey),
 z as (select o_custkey,
   map_zip_with(m1, m2, (k, a, b) -> coalesce(a, cast(0 as bigint)) + coalesce(b, cast(0 as bigint))) mm
  from m)
 select o_custkey,
  cast(size(mm) as bigint) n_keys,
  coalesce(try_element_at(mm, 'O'), cast(0 as bigint)) open_cnt,
  array_join(transform(array_sort(map_entries(mm)),
    e -> concat(e.key, ':', cast(e.value as string))), ',') entries
 from z order by o_custkey limit 300""",
      """with c as (select o_custkey, o_orderstatus st,
   cast(sum(case when o_totalprice < 150000 then 1 else 0 end) as bigint) lo_cnt,
   cast(sum(case when o_totalprice >= 150000 then 1 else 0 end) as bigint) hi_cnt
  from orders group by o_custkey, o_orderstatus)
 select o_custkey,
  cast(count(*) as bigint) n_keys,
  cast(coalesce(max(case when st = 'O' then lo_cnt + hi_cnt end), 0) as bigint) open_cnt,
  string_agg(st || ':' || cast(lo_cnt + hi_cnt as varchar), ',' order by st) entries
 from c group by o_custkey order by o_custkey limit 300"""),

    // Components over the NETTED store (round 14): q187's last-action
    // netting feeding the q72 component machinery — the full ClusterLoop
    // semantics (store → present edges → labels) at a fixed edge set,
    // under the hash gate. The pair space is BLOCK-DIAGONAL by
    // construction (hi's block is derived from lo's), so the graph has
    // ≥5 structural components regardless of which pairs the netting
    // keeps; labels are min reachable node via recursive reachability
    // (the q72 oracle pattern). Integer division dialects: Spark `div`,
    // DuckDB `//`. DIALECT SPLIT (H8, the q72 precedent): the recursive
    // reachability needs UNION-distinct to terminate on a symmetric edge
    // set, which Spark 4.1 rejects — the Spark-side lowering is the
    // netting kernel + the iterative DedupOps.connectedComponents (the
    // DF impl), and CorpusSqlSpec pins the error class still firing on
    // this text so a future Spark re-enables it.
    q2("q189_netted_components",
      """with recursive log as (select concat('a', cast(l_partkey % 25 as string)) lo,
   concat('b', cast((l_partkey % 25) div 5 * 5 + l_suppkey % 5 as string)) hi,
   case when cast(l_quantity as bigint) % 2 = 0 then 1 else -1 end sign,
   l_orderkey b from lineitem),
 batch as (select lo, hi, b, max(sign) sign from log group by lo, hi, b),
 netted as (select lo, hi, max_by(sign, b) s from batch group by lo, hi),
 net as (select lo, hi from netted where s > 0),
 e as (select lo u, hi v from net union select hi, lo from net),
 reach(u, v) as (select u, u from e union select r.u, e2.v from reach r join e e2 on r.v = e2.u)
 select u doc, min(v) as label from reach group by u order by u""",
      """with recursive log as (select concat('a', cast(l_partkey % 25 as varchar)) lo,
   concat('b', cast((l_partkey % 25) // 5 * 5 + l_suppkey % 5 as varchar)) hi,
   case when cast(l_quantity as bigint) % 2 = 0 then 1 else -1 end sign,
   l_orderkey b from lineitem),
 batch as (select lo, hi, b, max(sign) sign from log group by lo, hi, b),
 netted as (select lo, hi, max_by(sign, b) s from batch group by lo, hi),
 net as (select lo, hi from netted where s > 0),
 e as (select lo u, hi v from net union select hi, lo from net),
 reach(u, v) as (select u, u from e union select r.u, e2.v from reach r join e e2 on r.v = e2.u)
 select u doc, min(v) as label from reach group by u order by u"""),

    // Fuzzy eval-set decontamination (round 14): the crossNearDup kernel
    // hash-pinned (the q55 precedent — md5-keyed minhash makes even the
    // probabilistic candidate path deterministic cross-engine). Corpus
    // docs whose token set is Jaccard->=0.8 near ANY eval row (eval =
    // docs with id < 10), with candidates formed ONLY across the sets —
    // the corpus's own pair space never enters the plan. The Spark twin
    // runs the REAL operator (threshold-derived banding k=30/bands=6,
    // native minhash_sig + jaccard_sorted).
    q2("q190_fuzzy_decontam",
      fuzzyDecontamSql(sparkTok("")),
      fuzzyDecontamSql(duckTok(""))),
  )

  /** Keep/drop for docs with id >= 150 under minhash-signature dedup over
    * the WHOLE corpus: keeper = min doc_id per 8-hash signature. The prior/
    * batch split is semantic only — the SQL computes the union result the
    * incremental operator must match. */
  private def incrementalDedupSql(wsrc: String, sigkey: String): String =
    s"""with w as ($wsrc),
 sig as (select doc_id, ${(1 to 8).map(mh).mkString(",\n   ")} from w group by doc_id),
 keyed as (select doc_id, $sigkey sigkey from sig),
 keeper as (select sigkey, min(doc_id) keep_id from keyed group by sigkey)
 select k.doc_id, kp.keep_id, k.doc_id <> kp.keep_id is_dup
 from keyed k join keeper kp on k.sigkey = kp.sigkey
 where k.doc_id >= 150 order by k.doc_id limit 300"""

  /** Connected components of the J>=0.8 near-dup graph via recursive
    * reachability; label = min reachable node (incl. self). */
  private def dupComponentsSql(wsrc: String): String =
    s"""with recursive t as ($wsrc),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.w=b.w and a.doc_id < b.doc_id group by a.doc_id, b.doc_id),
 pairs as (select d1, d2 from inter
   join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
   where cast(i as double)/(s1.n+s2.n-i) >= 0.8),
 e as (select d1 u, d2 v from pairs union select d2, d1 from pairs),
 reach(u, v) as (select u, u from e union select r.u, e2.v from reach r join e e2 on r.v = e2.u)
 select u doc, min(v) as label from reach group by u order by u"""

  val byName: Map[String, CorpusQuery] = all.map(c => c.name -> c).toMap
}
