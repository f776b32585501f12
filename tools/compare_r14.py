# Round-14 final-numbers analysis: compares bench_full.json (end-of-round
# run at HEAD) against plans/r14/bench_before_r14_32c.json (round baseline),
# splitting rows into touched (by any r14 change section) vs untouched,
# using the untouched median now/before ratio as the ambient-drift control.
import json, math, sys

base = json.load(open('/root/repo/plans/r14/bench_before_r14_32c.json'))
now = json.load(open('/root/repo/bench_full.json'))

bq = base['queries']; nq = now['queries']

touched = set("""
q150_pq_codes q151_pq_distortion q152_ivfpq_topk q153_ivfpq_rerank q154_ivfpq_residual
q155_ivfpq_indexed q157_ivfpq_append q159_ivfpq_compact q168_stream_pq_append
q136_curation_stream q138_curation_stream_n3 q166_curation_stream_n5
q86_bm25_batch q111_stream_cdc_apply q89_cdc_merge q163_stream_pack
q139_zorder_scan_probe q141_zcompact_scan
q144_gopher_rules q169_bpe_byte_roundtrip q64_image_resize q91_cosine_pairs
q122_span_cut_lossless q142_dsir_select q95_repeated_windows q102_classifier_score
q58_chunk_tokens q60_msgpack_roundtrip
q174_stream_postings q82_bm25_topk q83_bm25_lexicon q164_hybrid_postings
q78_stream_ingest_screen q84_evolving_ingest_screen q124_semantic_ingest_screen
q173_image_ingest_screen
""".split())

common = sorted(set(bq) & set(nq))
unt = [q for q in common if q not in touched]
tch = [q for q in common if q in touched]

def med(xs):
    xs = sorted(xs); n = len(xs)
    return xs[n//2] if n % 2 else (xs[n//2-1]+xs[n//2])/2

ratios_unt = [nq[q]/bq[q] for q in unt if bq[q] > 0]
drift = med(ratios_unt)
print(f"total before={base['value']:.2f} now={now['value']:.2f} n={len(common)}")
print(f"untouched rows n={len(unt)} median now/before ratio={drift:.3f}")

bs = sum(bq[q] for q in tch); ns = sum(nq[q] for q in tch)
geo = math.exp(sum(math.log(bq[q]/nq[q]) for q in tch)/len(tch))
geo_c = math.exp(sum(math.log(bq[q]/(nq[q]/drift)) for q in tch)/len(tch))
print(f"touched n={len(tch)} sum {bs:.2f} -> {ns:.2f} raw (sum {bs/ns:.2f}x, geomean {geo:.2f}x, drift-corrected geomean {geo_c:.2f}x)")

sp = sorted(tch, key=lambda q: -(bq[q]/nq[q]))
print("\ntop touched speedups (raw):")
for q in sp[:14]:
    print(f"  {q}: {bq[q]:.2f} -> {nq[q]:.2f} ({bq[q]/nq[q]:.2f}x)")
print("\ntouched rows reading slower raw:")
for q in sp:
    if bq[q]/nq[q] < 1.0:
        print(f"  {q}: {bq[q]:.2f} -> {nq[q]:.2f} ({bq[q]/nq[q]:.2f}x)")
print("\nuntouched rows slower than 0.70x (vs drift %.3f):" % drift)
for q in sorted(unt, key=lambda q: bq[q]/nq[q]):
    if bq[q]/nq[q] < 0.70:
        print(f"  {q}: {bq[q]:.2f} -> {nq[q]:.2f} ({bq[q]/nq[q]:.2f}x)")
iso = now.get('queries_isolated', {})
if iso: print("\nisolated:", {k: round(v,2) for k,v in iso.items()})
print("failed:", now.get('failed'), "skipped:", now.get('skipped'))
