# ROUND-1 SNAPSHOT (historical). The canonical corpus now lives in
# src/main/scala/graft/Corpus.scala; regenerate expected hashes from the
# engine's own declaration via:
#   sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
#   python3 run_oracle.py /root/testdata/sf0.01 /tmp/verify_out/oracle_sql.json
# (a committed copy of the dump is kept at verification/oracle_sql.json).
# Declared t2 oracle corpus. Each entry: shared 'sql' or per-engine {'spark':..., 'duckdb':...}
SIM_SPARK = """round(aggregate(zip_with(p.embedding, g.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (a,x)->a+x)
 / (sqrt(aggregate(transform(p.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(a,x)->a+x))
  * sqrt(aggregate(transform(g.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(a,x)->a+x))),6)"""
SIM_DUCK = "round(list_cosine_similarity(p.embedding::DOUBLE[], g.embedding::DOUBLE[]),6)"

CORPUS = {
"q01_scan_filter_project": dict(sql="""select l_orderkey, l_linenumber, round(l_extendedprice*(1-l_discount),2) net
 from lineitem where l_quantity > 45 and l_shipdate >= timestamp '1997-01-01 00:00:00'
 order by l_orderkey, l_linenumber limit 100"""),
"q02_filter_in_like": dict(sql="""select p_partkey, p_name, p_type from part
 where p_type in ('PROMO','ECONOMY') and p_name like '%a%' order by p_partkey limit 100"""),
"q03_agg_tpch1_decimal": dict(sql="""select l_returnflag, l_linestatus,
 round(cast(sum(cast(l_quantity as decimal(18,4))) as double),4) sq,
 round(cast(sum(cast(l_extendedprice as decimal(18,4))) as double),4) sp,
 round(cast(sum(cast(l_extendedprice as decimal(18,4))*cast(1-l_discount as decimal(18,4))) as double),4) net, count(*) c
 from lineitem where l_shipdate <= timestamp '1998-09-02 00:00:00'
 group by l_returnflag, l_linestatus order by l_returnflag, l_linestatus"""),
"q04_having": dict(sql="""select o_custkey, count(*) c, round(cast(sum(cast(o_totalprice as decimal(18,4))) as double),4) s
 from orders group by o_custkey having count(*) >= 14 order by o_custkey"""),
"q05_count_distinct": dict(sql="""select count(distinct o_custkey) a, count(distinct o_orderpriority) b, count(distinct o_orderstatus) c from orders"""),
"q06_distinct": dict(sql="""select distinct l_returnflag, l_linestatus from lineitem order by 1,2"""),
"q07_join_inner": dict(sql="""select c.c_custkey, c.c_name, o.o_orderkey, o.o_orderstatus from customer c
 join orders o on c.c_custkey=o.o_custkey where c.c_mktsegment='BUILDING' order by c.c_custkey, o.o_orderkey limit 100"""),
"q08_join_left": dict(sql="""select c.c_custkey, count(o.o_orderkey) n from customer c
 left join orders o on c.c_custkey=o.o_custkey and o.o_totalprice > 400000
 group by c.c_custkey order by c.c_custkey limit 100"""),
"q09_join_full": dict(sql="""select coalesce(a.k, b.k) k, a.ca, b.cb from
 (select o_orderpriority k, count(*) ca from orders where o_orderstatus='F' group by o_orderpriority) a
 full join (select event_type k, count(*) cb from events group by event_type) b on a.k=b.k
 order by k"""),
"q10_join_semi_exists": dict(sql="""select p_partkey, p_name from part p
 where exists (select 1 from lineitem l where l.l_partkey=p.p_partkey and l.l_quantity > 49)
 order by p_partkey limit 100"""),
"q11_join_anti": dict(sql="""select c_custkey from customer c
 where not exists (select 1 from orders o where o.o_custkey=c.c_custkey and o.o_orderpriority='1-URGENT')
 order by c_custkey limit 100"""),
"q12_join_cross": dict(sql="""select r1.r_name a, r2.r_name b from region r1 cross join region r2 order by r1.r_name, r2.r_name"""),
"q13_join_theta": dict(sql="""select p1.p_brand, count(*) pairs from part p1
 join part p2 on p1.p_brand=p2.p_brand and p1.p_size < p2.p_size group by p1.p_brand order by p1.p_brand"""),
"q14_join_range_band": dict(sql="""select e1.event_id a, e2.event_id b from events e1 join events e2
 on e1.user_id=e2.user_id and e2.ts > e1.ts and e2.ts <= e1.ts + interval 5 minute
 where e1.event_type='click' and e2.event_type='purchase' order by e1.event_id, e2.event_id limit 100"""),
"q15_asof_correlated": dict(sql="""select p.event_id, (select max(c.ts) from events c
 where c.user_id=p.user_id and c.event_type='click' and c.ts <= p.ts) last_click
 from events p where p.event_type='purchase' order by p.event_id limit 200"""),
"q16_window_ranking": dict(sql="""select o_orderkey, o_custkey,
 row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rn,
 rank() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rk,
 dense_rank() over (partition by o_custkey order by o_totalprice desc, o_orderkey) dr,
 ntile(4) over (partition by o_custkey order by o_orderkey) nt
 from orders order by o_custkey, o_orderkey limit 200"""),
"q17_window_analytic": dict(sql="""select event_id, user_id,
 lag(value,1) over (partition by user_id order by ts, event_id) pv,
 lead(value,1) over (partition by user_id order by ts, event_id) nv,
 first_value(value) over (partition by user_id order by ts, event_id) fv,
 last_value(value) over (partition by user_id order by ts, event_id rows between unbounded preceding and unbounded following) lv
 from events order by user_id, event_id limit 300"""),
"q18_window_frames": dict(sql="""select o_orderkey, o_custkey,
 round(sum(o_totalprice) over (partition by o_custkey order by o_orderdate, o_orderkey rows between 3 preceding and current row),2) s3,
 round(cast(sum(cast(o_totalprice as decimal(18,4))) over (partition by o_custkey order by o_totalprice range between 50000 preceding and current row) as double),4) rs,
 count(*) over (partition by o_custkey order by o_totalprice range between 50000 preceding and current row) rc
 from orders order by o_custkey, o_orderkey limit 200"""),
"q19_topk_per_group": dict(sql="""select o_custkey, o_orderkey, o_totalprice, rn from
 (select o_custkey, o_orderkey, o_totalprice,
  row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rn from orders) t
 where rn <= 3 order by o_custkey, rn limit 300"""),
"q20_sort_offset": dict(sql="""select l_orderkey, l_linenumber, l_extendedprice from lineitem
 order by l_extendedprice desc, l_orderkey, l_linenumber limit 50 offset 100"""),
"q21_union": dict(sql="""select x from (select o_custkey x from orders where o_totalprice > 400000
 union select c_custkey from customer where c_acctbal < 0) t order by x limit 100"""),
"q22_intersect_except": dict(sql="""select x, 'i' tag from (select o_custkey x from orders where o_orderstatus='P'
 intersect select c_custkey from customer where c_acctbal > 0) t1
 union all
 select x, 'e' tag from (select c_custkey x from customer except select o_custkey from orders) t2
 order by tag, x limit 200"""),
"q23_string_funcs": dict(
 spark="""select p_partkey, upper(p_name) u, lower(p_brand) lo, substr(p_name,1,5) s, length(p_name) len,
 replace(p_type,'A','@') rep, trim(concat(' ', p_name, ' ')) tr, lpad(cast(p_partkey as string), 8, '0') pad, reverse(p_brand) rev
 from part order by p_partkey limit 100""",
 duckdb="""select p_partkey, upper(p_name) u, lower(p_brand) lo, substr(p_name,1,5) s, length(p_name) len,
 replace(p_type,'A','@') rep, trim(concat(' ', p_name, ' ')) tr, lpad(cast(p_partkey as varchar), 8, '0') pad, reverse(p_brand) rev
 from part order by p_partkey limit 100"""),
"q24_regexp": dict(sql="""select doc_id, regexp_extract(text, '([a-z]+)', 1) first_word from documents order by doc_id limit 100"""),
"q25_date_funcs": dict(
 spark="""select o_orderkey, extract(year from o_orderdate) y, extract(month from o_orderdate) m,
 extract(day from o_orderdate) d, date_trunc('month', o_orderdate) mo, o_orderdate + interval 30 day plus30,
 datediff(cast(o_orderdate + interval 30 day as date), cast(o_orderdate as date)) dd
 from orders order by o_orderkey limit 100""",
 duckdb="""select o_orderkey, extract(year from o_orderdate) y, extract(month from o_orderdate) m,
 extract(day from o_orderdate) d, date_trunc('month', o_orderdate) mo, o_orderdate + interval 30 day plus30,
 date_diff('day', o_orderdate, o_orderdate + interval 30 day) dd
 from orders order by o_orderkey limit 100"""),
"q26_math_funcs": dict(sql="""select l_orderkey, l_linenumber, round(abs(l_discount - 0.05),4) ab,
 cast(floor(l_quantity) as bigint) fl, cast(ceil(l_quantity) as bigint) ce,
 round(sqrt(l_extendedprice),4) sq, round(power(l_discount + 1, 2),6) pw,
 l_partkey % 7 md, cast(sign(l_discount - 0.05) as int) sg, round(ln(l_extendedprice),6) lg
 from lineitem order by l_orderkey, l_linenumber limit 100"""),
"q27_case_cast_coalesce": dict(sql="""select o_orderkey,
 case when o_totalprice > 300000 then 'big' when o_totalprice > 100000 then 'mid' else 'small' end bucket,
 coalesce(nullif(o_orderstatus,'O'),'open') st, cast(floor(o_totalprice) as bigint) ti
 from orders order by o_orderkey limit 200"""),
"q28_json": dict(
 spark="""select event_id, cast(get_json_object(props,'$.k') as int) k from events order by event_id limit 200""",
 duckdb="""select event_id, cast(json_extract(props,'$.k') as integer) k from events order by event_id limit 200"""),
"q29_array_ops": dict(
 spark="""select vec_id, size(embedding) n, element_at(embedding,1) e1,
 round(aggregate(slice(embedding,1,8), cast(0.0 as double), (a,x)->a+cast(x as double)),4) s8,
 array_contains(embedding, element_at(embedding,1)) has1
 from embeddings order by vec_id limit 100""",
 duckdb="""select vec_id, len(embedding) n, embedding[1] e1,
 round(list_sum(embedding[1:8]::DOUBLE[]),4) s8, list_contains(embedding, embedding[1]) has1
 from embeddings order by vec_id limit 100"""),
"q30_collect_sorted": dict(
 spark="""select l_orderkey, array_join(transform(sort_array(collect_list(l_linenumber)), x -> cast(x as string)), ',') ls from lineitem group by l_orderkey order by l_orderkey limit 100""",
 duckdb="""select l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') ls from lineitem group by l_orderkey order by l_orderkey limit 100"""),
"q31_wordcount": dict(
 spark="""select w, count(*) c from (select explode(split(text,' ')) w from documents) t group by w order by c desc, w""",
 duckdb="""select w, count(*) c from (select unnest(string_split(text,' ')) w from documents) t group by w order by c desc, w"""),
"q32_bigrams": dict(
 spark="""with tok as (select doc_id, pos, w from documents lateral view posexplode(split(text,' ')) t as pos, w)
 select concat(t1.w, ' ', t2.w) bg, count(*) c from tok t1 join tok t2 on t1.doc_id=t2.doc_id and t2.pos=t1.pos+1
 group by concat(t1.w, ' ', t2.w) order by c desc, bg limit 50""",
 duckdb="""with tok as (select doc_id, generate_subscripts(l,1)-1 pos, unnest(l) w from (select doc_id, string_split(text,' ') l from documents) s)
 select concat(t1.w, ' ', t2.w) bg, count(*) c from tok t1 join tok t2 on t1.doc_id=t2.doc_id and t2.pos=t1.pos+1
 group by concat(t1.w, ' ', t2.w) order by c desc, bg limit 50"""),
"q33_dedup_exact": dict(sql="""select h, count(*) c, min(doc_id) keep from
 (select doc_id, md5(substr(text,1,16)) h from documents) t group by h having count(*) > 1 order by h limit 100"""),
"q34_jaccard_neardup": dict(
 spark="""with t as (select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents where doc_id < 200) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.w=b.w and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200""",
 duckdb="""with t as (select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents where doc_id < 200) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.w=b.w and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200"""),
"q35_cosine_topk": dict(
 spark=f"""select g.vec_id, {SIM_SPARK} sim from embeddings g join embeddings p on p.vec_id=0
 order by sim desc, g.vec_id limit 20""",
 duckdb=f"""select g.vec_id, {SIM_DUCK} sim from embeddings g join embeddings p on p.vec_id=0
 order by sim desc, g.vec_id limit 20"""),
"q36_knn": dict(
 spark=f"""select p_id, g_id, s from (select p.vec_id p_id, g.vec_id g_id, {SIM_SPARK} s,
 row_number() over (partition by p.vec_id order by {SIM_SPARK} desc, g.vec_id) rn
 from embeddings p join embeddings g on g.vec_id >= 20 where p.vec_id < 20) t where rn = 1 order by p_id""",
 duckdb=f"""select p_id, g_id, s from (select p.vec_id p_id, g.vec_id g_id, {SIM_DUCK} s,
 row_number() over (partition by p.vec_id order by {SIM_DUCK} desc, g.vec_id) rn
 from embeddings p join embeddings g on g.vec_id >= 20 where p.vec_id < 20) t where rn = 1 order by p_id"""),
"q37_sessionize": dict(sql="""with e as (select user_id, ts, event_id,
 case when lag(ts) over (partition by user_id order by ts, event_id) is null
      or ts - lag(ts) over (partition by user_id order by ts, event_id) > interval 30 minute then 1 else 0 end brk
 from events)
 select user_id, count(distinct sid) n_sessions from
 (select user_id, sum(brk) over (partition by user_id order by ts, event_id rows between unbounded preceding and current row) sid from e) t
 group by user_id order by user_id limit 200"""),
"q38_tumbling_window": dict(sql="""select date_trunc('hour', ts) w, event_type, count(*) c,
 round(cast(sum(cast(value as decimal(18,4))) as double),4) v from events group by date_trunc('hour', ts), event_type
 order by w, event_type limit 500"""),
"q39_sliding_window": dict(sql="""with e as (select case when extract(minute from ts) >= 30
   then date_trunc('hour', ts) + interval 30 minute else date_trunc('hour', ts) end b, value from events)
 select w, count(*) c, round(cast(sum(cast(value as decimal(18,4))) as double),4) v from
 (select b w, value from e union all select b - interval 30 minute w, value from e) t
 group by w order by w limit 500"""),
"q40_pivot_manual": dict(sql="""select user_id,
 count(case when event_type='click' then 1 end) clicks,
 count(case when event_type='view' then 1 end) n_views,
 round(cast(sum(case when event_type='purchase' then cast(value as decimal(18,4)) else cast(0 as decimal(18,4)) end) as double),4) purchase_v
 from events group by user_id order by user_id limit 200"""),
"q41_scalar_subquery": dict(sql="""select o_orderkey, o_totalprice from orders
 where o_totalprice > (select max(o_totalprice) * 0.5 from orders) order by o_orderkey limit 200"""),
"q42_in_subquery": dict(sql="""select c_custkey from customer
 where c_custkey in (select o_custkey from orders where o_orderpriority='1-URGENT') order by c_custkey limit 200"""),
"q43_rollup": dict(sql="""select l_returnflag f, l_linestatus s, count(*) c from lineitem
 group by rollup(l_returnflag, l_linestatus) order by f nulls first, s nulls first"""),
"q44_cube": dict(sql="""select coalesce(l_returnflag,'ALL') f, coalesce(l_linestatus,'ALL') s, count(*) c
 from lineitem group by cube(l_returnflag, l_linestatus) order by f, s"""),
"q45_grouping_sets": dict(sql="""select l_returnflag f, l_linestatus s, grouping(l_returnflag) gf, grouping(l_linestatus) gs, count(*) c
 from lineitem group by grouping sets ((l_returnflag),(l_returnflag,l_linestatus),())
 order by gf, gs, f nulls first, s nulls first"""),
"q46_percentile": dict(
 spark="""select round(percentile(o_totalprice, 0.5),4) p50, round(percentile(o_totalprice, 0.9),4) p90 from orders""",
 duckdb="""select round(quantile_cont(o_totalprice, 0.5),4) p50, round(quantile_cont(o_totalprice, 0.9),4) p90 from orders"""),
"q47_stats": dict(sql="""select l_returnflag, round(stddev_samp(l_extendedprice),2) sd,
 round(corr(l_extendedprice, l_quantity),6) co, round(covar_samp(l_extendedprice, l_quantity),2) cv
 from lineitem group by l_returnflag order by l_returnflag"""),
"q48_minmax_by": dict(sql="""select o_custkey, max_by(o_orderstatus, o_orderkey) last_st, min_by(o_orderstatus, o_orderkey) first_st,
 max(o_orderkey) mx from orders group by o_custkey order by o_custkey limit 200"""),
"q49_filtered_agg": dict(sql="""select l_returnflag, count(*) filter (where l_quantity > 25) hi, count(*) total,
 bool_or(l_discount > 0.09) anyhi, bool_and(l_quantity > 0) allpos
 from lineitem group by l_returnflag order by l_returnflag"""),
# ---- q50+: LLM training-data pipeline extensions (md5-keyed; see Corpus.scala) ----
"q50_langid": dict(
 spark="""select doc_id, n_tok, round(hits / n_tok, 4) stop_ratio,
 case when hits / n_tok >= 0.04 then 'en' else 'und' end lang_guess
 from (select doc_id, cast(size(split(text,' ')) as double) n_tok,
  cast(size(filter(split(text,' '), w -> w = 'the' or w = 'a' or w = 'of' or w = 'and' or w = 'to' or w = 'in' or w = 'is' or w = 'it')) as double) hits
 from documents) t order by doc_id limit 300""",
 duckdb="""select doc_id, n_tok, round(hits / n_tok, 4) stop_ratio,
 case when hits / n_tok >= 0.04 then 'en' else 'und' end lang_guess
 from (select doc_id, cast(len(string_split(text,' ')) as double) n_tok,
  cast(len(list_filter(string_split(text,' '), w -> w = 'the' or w = 'a' or w = 'of' or w = 'and' or w = 'to' or w = 'in' or w = 'is' or w = 'it')) as double) hits
 from documents) t order by doc_id limit 300"""),
"q51_quality": dict(
 spark="""select doc_id, length(text) n_chars, size(split(text,' ')) n_tok,
 round(cast(size(array_distinct(split(text,' '))) as double) / size(split(text,' ')), 4) ttr,
 round(cast(length(replace(text,' ','')) as double) / size(split(text,' ')), 4) avg_wlen,
 case when size(split(text,' ')) >= 30 and size(array_distinct(split(text,' '))) >= 15 then 'keep' else 'drop' end verdict
 from documents order by doc_id limit 300""",
 duckdb="""select doc_id, length(text) n_chars, len(string_split(text,' ')) n_tok,
 round(cast(len(list_distinct(string_split(text,' '))) as double) / len(string_split(text,' ')), 4) ttr,
 round(cast(length(replace(text,' ','')) as double) / len(string_split(text,' ')), 4) avg_wlen,
 case when len(string_split(text,' ')) >= 30 and len(list_distinct(string_split(text,' '))) >= 15 then 'keep' else 'drop' end verdict
 from documents order by doc_id limit 300"""),
"q52_token_count": dict(
 spark="""select doc_id, size(split(text,' ')) ws_tokens,
 regexp_count(text, '[a-z]+') alpha_tokens,
 regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') bpe_ish,
 length(text) n_chars from documents order by doc_id limit 300""",
 duckdb="""select doc_id, len(string_split(text,' ')) ws_tokens,
 len(regexp_extract_all(text, '[a-z]+')) alpha_tokens,
 len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) bpe_ish,
 length(text) n_chars from documents order by doc_id limit 300"""),
"q53_fingerprint": dict(
 spark="""with s as (select doc_id, explode(transform(sequence(1, greatest(size(split(text,' '))-2, 1)),
   i -> concat_ws(' ', slice(split(text,' '), i, 3)))) sh from documents),
 fp as (select doc_id, min(substr(md5(sh),1,16)) shingle_fp, count(distinct sh) n_shingles from s group by doc_id)
 select d.doc_id, md5(d.text) doc_fp, f.shingle_fp, f.n_shingles
 from documents d join fp f on d.doc_id=f.doc_id order by d.doc_id limit 300""",
 duckdb="""with s as (select doc_id, unnest(list_transform(generate_series(1, greatest(len(l)-2, 1)),
   i -> array_to_string(l[i:i+2], ' '))) sh from (select doc_id, string_split(text,' ') l from documents) x),
 fp as (select doc_id, min(substr(md5(sh),1,16)) shingle_fp, count(distinct sh) n_shingles from s group by doc_id)
 select d.doc_id, md5(d.text) doc_fp, f.shingle_fp, f.n_shingles
 from documents d join fp f on d.doc_id=f.doc_id order by d.doc_id limit 300"""),
"q54_minhash_sig": dict(
 spark="""with w as (select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents) x)
 select doc_id, min(substr(md5(concat('1:',w)),1,12)) h1, min(substr(md5(concat('2:',w)),1,12)) h2, min(substr(md5(concat('3:',w)),1,12)) h3, min(substr(md5(concat('4:',w)),1,12)) h4
 from w group by doc_id order by doc_id limit 300""",
 duckdb="""with w as (select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents) x)
 select doc_id, min(substr(md5(concat('1:',w)),1,12)) h1, min(substr(md5(concat('2:',w)),1,12)) h2, min(substr(md5(concat('3:',w)),1,12)) h3, min(substr(md5(concat('4:',w)),1,12)) h4
 from w group by doc_id order by doc_id limit 300"""),
"q55_minhash_lsh": dict(
 spark="""with w as (select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents where doc_id < 200) x),
 sig as (select doc_id, min(substr(md5(concat('1:',w)),1,12)) h1,
   min(substr(md5(concat('2:',w)),1,12)) h2,
   min(substr(md5(concat('3:',w)),1,12)) h3,
   min(substr(md5(concat('4:',w)),1,12)) h4,
   min(substr(md5(concat('5:',w)),1,12)) h5,
   min(substr(md5(concat('6:',w)),1,12)) h6,
   min(substr(md5(concat('7:',w)),1,12)) h7,
   min(substr(md5(concat('8:',w)),1,12)) h8 from w group by doc_id),
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
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200""",
 duckdb="""with w as (select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents where doc_id < 200) x),
 sig as (select doc_id, min(substr(md5(concat('1:',w)),1,12)) h1,
   min(substr(md5(concat('2:',w)),1,12)) h2,
   min(substr(md5(concat('3:',w)),1,12)) h3,
   min(substr(md5(concat('4:',w)),1,12)) h4,
   min(substr(md5(concat('5:',w)),1,12)) h5,
   min(substr(md5(concat('6:',w)),1,12)) h6,
   min(substr(md5(concat('7:',w)),1,12)) h7,
   min(substr(md5(concat('8:',w)),1,12)) h8 from w group by doc_id),
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
 where cast(i as double)/(s1.n+s2.n-i) >= 0.8 order by d1, d2 limit 200"""),
"q56_simhash": dict(
 spark="""with w as (select distinct doc_id, w from (select doc_id, explode(split(text,' ')) w from documents) x),
 bits as (select doc_id, j, sum(case when cast(floor((instr('0123456789abcdef', substr(md5(w), 1 + cast(floor(j/4) as int), 1)) - 1) / cast(power(2, j % 4) as int)) as int) % 2 = 1 then 1 else -1 end) s
  from w cross join (select explode(sequence(0,15)) j) js group by doc_id, j)
 select doc_id, cast(sum(case when s > 0 then cast(power(2, j) as bigint) else 0 end) as bigint) simhash
 from bits group by doc_id order by doc_id limit 300""",
 duckdb="""with w as (select distinct doc_id, w from (select doc_id, unnest(string_split(text,' ')) w from documents) x),
 bits as (select doc_id, j, sum(case when cast(floor((instr('0123456789abcdef', substr(md5(w), 1 + cast(floor(j/4) as int), 1)) - 1) / cast(power(2, j % 4) as int)) as int) % 2 = 1 then 1 else -1 end) s
  from w cross join (select unnest(generate_series(0,15)) j) js group by doc_id, j)
 select doc_id, cast(sum(case when s > 0 then cast(power(2, j) as bigint) else 0 end) as bigint) simhash
 from bits group by doc_id order by doc_id limit 300"""),
"q57_charngram_jaccard": dict(
 spark="""with t as (select distinct doc_id, sh from (select doc_id,
   explode(transform(sequence(1, greatest(length(text)-2,1)), i -> substr(text, i, 3))) sh
   from documents where doc_id < 100) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.sh=b.sh and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.55 order by d1, d2 limit 200""",
 duckdb="""with t as (select distinct doc_id, sh from (select doc_id,
   unnest(list_transform(generate_series(1, greatest(length(text)-2,1)), i -> text[i:i+2])) sh
   from (select doc_id, text from documents where doc_id < 100) y) x),
 sizes as (select doc_id, count(*) n from t group by doc_id),
 inter as (select a.doc_id d1, b.doc_id d2, count(*) i from t a join t b on a.sh=b.sh and a.doc_id < b.doc_id group by a.doc_id, b.doc_id)
 select d1, d2, round(cast(i as double)/(s1.n+s2.n-i),4) j from inter
 join sizes s1 on s1.doc_id=d1 join sizes s2 on s2.doc_id=d2
 where cast(i as double)/(s1.n+s2.n-i) >= 0.55 order by d1, d2 limit 200"""),
"q58_embedding_neardup": dict(
 spark="""select a.vec_id d1, b.vec_id d2, round(aggregate(zip_with(a.embedding, b.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(a.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(b.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) s
 from embeddings a join embeddings b on a.vec_id < b.vec_id
 where round(aggregate(zip_with(a.embedding, b.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(a.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(b.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) >= 0.44 order by d1, d2 limit 200""",
 duckdb="""select a.vec_id d1, b.vec_id d2, round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),6) s
 from embeddings a join embeddings b on a.vec_id < b.vec_id
 where round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),6) >= 0.44 order by d1, d2 limit 200"""),
"q59_ann_ivf": dict(
 spark="""with assign as (
  select v.vec_id, c.vec_id cid,
   row_number() over (partition by v.vec_id order by round(aggregate(zip_with(v.embedding, c.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(v.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(c.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) desc, c.vec_id) rn
  from embeddings v join embeddings c on c.vec_id < 8 where v.vec_id >= 8),
 clu as (select vec_id, cid from assign where rn = 1),
 scored as (
  select p.vec_id probe, p.cid, g.vec_id cand, round(aggregate(zip_with(pe.embedding, ge.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(pe.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(ge.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) s,
   row_number() over (partition by p.vec_id order by round(aggregate(zip_with(pe.embedding, ge.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(pe.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(ge.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) desc, g.vec_id) rn
  from clu p join embeddings pe on pe.vec_id = p.vec_id
  join clu g on g.cid = p.cid and g.vec_id < 490
  join embeddings ge on ge.vec_id = g.vec_id
  where p.vec_id >= 490)
 select probe, cid, cand, s from scored where rn = 1 order by probe""",
 duckdb="""with assign as (
  select v.vec_id, c.vec_id cid,
   row_number() over (partition by v.vec_id order by round(list_cosine_similarity(v.embedding::DOUBLE[], c.embedding::DOUBLE[]),6) desc, c.vec_id) rn
  from embeddings v join embeddings c on c.vec_id < 8 where v.vec_id >= 8),
 clu as (select vec_id, cid from assign where rn = 1),
 scored as (
  select p.vec_id probe, p.cid, g.vec_id cand, round(list_cosine_similarity(pe.embedding::DOUBLE[], ge.embedding::DOUBLE[]),6) s,
   row_number() over (partition by p.vec_id order by round(list_cosine_similarity(pe.embedding::DOUBLE[], ge.embedding::DOUBLE[]),6) desc, g.vec_id) rn
  from clu p join embeddings pe on pe.vec_id = p.vec_id
  join clu g on g.cid = p.cid and g.vec_id < 490
  join embeddings ge on ge.vec_id = g.vec_id
  where p.vec_id >= 490)
 select probe, cid, cand, s from scored where rn = 1 order by probe"""),
"q60_ann_lsh": dict(
 spark="""with bk as (select e.vec_id, concat(case when round(aggregate(sequence(1,64), cast(0.0 as double),
 (acc,i) -> acc + cast(element_at(e.embedding, i) as double) * (instr('0123456789abcdef', substr(md5(concat(cast(1 as string),':',cast(i as string))),1,1)) - 8)),6) >= 0 then '1' else '0' end, case when round(aggregate(sequence(1,64), cast(0.0 as double),
 (acc,i) -> acc + cast(element_at(e.embedding, i) as double) * (instr('0123456789abcdef', substr(md5(concat(cast(2 as string),':',cast(i as string))),1,1)) - 8)),6) >= 0 then '1' else '0' end, case when round(aggregate(sequence(1,64), cast(0.0 as double),
 (acc,i) -> acc + cast(element_at(e.embedding, i) as double) * (instr('0123456789abcdef', substr(md5(concat(cast(3 as string),':',cast(i as string))),1,1)) - 8)),6) >= 0 then '1' else '0' end, case when round(aggregate(sequence(1,64), cast(0.0 as double),
 (acc,i) -> acc + cast(element_at(e.embedding, i) as double) * (instr('0123456789abcdef', substr(md5(concat(cast(4 as string),':',cast(i as string))),1,1)) - 8)),6) >= 0 then '1' else '0' end) bucket from embeddings e),
 scored as (
  select p.vec_id probe, pb.bucket, g.vec_id cand, round(aggregate(zip_with(p.embedding, g.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(p.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(g.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) s,
   row_number() over (partition by p.vec_id order by round(aggregate(zip_with(p.embedding, g.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
 / (sqrt(aggregate(transform(p.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
  * sqrt(aggregate(transform(g.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))),6) desc, g.vec_id) rn
  from embeddings p join bk pb on pb.vec_id = p.vec_id
  join bk gb on gb.bucket = pb.bucket and gb.vec_id >= 8 and gb.vec_id < 490
  join embeddings g on g.vec_id = gb.vec_id
  where p.vec_id >= 490)
 select probe, bucket, cand, s from scored where rn = 1 order by probe""",
 duckdb="""with bk as (select e.vec_id, concat(case when round(list_sum(list_transform(generate_series(1,64),
 i -> e.embedding[i]::DOUBLE * (instr('0123456789abcdef', substr(md5(concat(1,':',i)),1,1)) - 8))),6) >= 0 then '1' else '0' end, case when round(list_sum(list_transform(generate_series(1,64),
 i -> e.embedding[i]::DOUBLE * (instr('0123456789abcdef', substr(md5(concat(2,':',i)),1,1)) - 8))),6) >= 0 then '1' else '0' end, case when round(list_sum(list_transform(generate_series(1,64),
 i -> e.embedding[i]::DOUBLE * (instr('0123456789abcdef', substr(md5(concat(3,':',i)),1,1)) - 8))),6) >= 0 then '1' else '0' end, case when round(list_sum(list_transform(generate_series(1,64),
 i -> e.embedding[i]::DOUBLE * (instr('0123456789abcdef', substr(md5(concat(4,':',i)),1,1)) - 8))),6) >= 0 then '1' else '0' end) bucket from embeddings e),
 scored as (
  select p.vec_id probe, pb.bucket, g.vec_id cand, round(list_cosine_similarity(p.embedding::DOUBLE[], g.embedding::DOUBLE[]),6) s,
   row_number() over (partition by p.vec_id order by round(list_cosine_similarity(p.embedding::DOUBLE[], g.embedding::DOUBLE[]),6) desc, g.vec_id) rn
  from embeddings p join bk pb on pb.vec_id = p.vec_id
  join bk gb on gb.bucket = pb.bucket and gb.vec_id >= 8 and gb.vec_id < 490
  join embeddings g on g.vec_id = gb.vec_id
  where p.vec_id >= 490)
 select probe, bucket, cand, s from scored where rn = 1 order by probe"""),
}
