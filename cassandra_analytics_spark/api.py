"""User-facing facade: the one-stop surface a user of the reference
connector would switch to.

Reference usage:

    spark.read.format("…CassandraDataSource").options(keyspace=…, table=…)
    df.write.format("…CassandraDataSink").mode("append").options(…)

Engine usage:

    eng = Engine(spark)                       # or Engine.local()
    df  = eng.read_table("lineitem")          # fixture catalog table
    t   = eng.table_from_ddl(CREATE_TABLE)    # CQL DDL → schema/metadata
    eng.bulk_write(df, "/data/tbl", ["pk"])   # tokenized sorted batches
    out = eng.read_bulk_table("/data/tbl", ["pk"])   # merge-on-read
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from cassandra_analytics_spark import catalog as _catalog
from cassandra_analytics_spark import schema as _schema
from cassandra_analytics_spark.operators.merge import (
    compaction_merge,
    last_modified_timestamp,
    latest_by_key,
    propagate_static_columns,
)
from cassandra_analytics_spark.session import get_session
from cassandra_analytics_spark.sinks import bulk_writer as _writer


class Engine:
    """Session + catalog + reader/writer in one handle."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir or _catalog.DEFAULT_SF_DIR

    @classmethod
    def local(cls, sf_dir: str | None = None, **session_kwargs) -> "Engine":
        return cls(get_session(**session_kwargs), sf_dir=sf_dir)

    # -- catalog / source -------------------------------------------------
    def read_table(self, name: str, sf_dir: str | None = None) -> DataFrame:
        return _catalog.load_table(self.spark, sf_dir or self.sf_dir, name)

    def register_views(self, sf_dir: str | None = None) -> dict[str, DataFrame]:
        return _catalog.register_views(self.spark, sf_dir or self.sf_dir)

    # -- schema (C1/C2) ---------------------------------------------------
    @staticmethod
    def table_from_ddl(ddl: str) -> _schema.CqlTable:
        return _schema.parse_create_table(ddl)

    @staticmethod
    def schema_from_ddl(ddl: str):
        return _schema.schema_for_ddl(ddl)

    # -- bulk write / read (S4/S5, W1-W4) --------------------------------
    def bulk_write(self, df: DataFrame, table_path: str, partition_keys: Sequence[str],
                   **kwargs) -> _writer.WriteResult:
        return _writer.bulk_write(df, table_path, partition_keys, **kwargs)

    def delete_partitions(self, keys_df: DataFrame, table_path: str,
                          partition_keys: Sequence[str], **kwargs) -> _writer.WriteResult:
        return _writer.bulk_write(
            keys_df, table_path, partition_keys,
            mode=_writer.WriteMode.DELETE_PARTITION, **kwargs,
        )

    def read_bulk_table(self, table_path: str, partition_keys: Sequence[str],
                        clustering_keys: Sequence[str] = (), merge: bool = True,
                        cell_lww: bool = False) -> DataFrame:
        return _writer.read_bulk_table(
            self.spark, table_path, partition_keys, clustering_keys,
            merge=merge, cell_lww=cell_lww,
        )

    def coordinated_bulk_write(
        self, df: DataFrame, target_paths: Sequence[str],
        partition_keys: Sequence[str], **kwargs,
    ) -> list[_writer.WriteResult]:
        """One DataFrame → several table paths, all-or-nothing joint
        commit (the reference's coordinated multi-cluster write)."""
        return _writer.coordinated_bulk_write(
            df, target_paths, partition_keys, **kwargs
        )

    # -- bundle transport (W4 blob path) ----------------------------------
    @staticmethod
    def bundle_write(df: DataFrame, store_path: str,
                     partition_keys: Sequence[str], **kwargs):
        from cassandra_analytics_spark.sinks.bundles import bundle_write

        return bundle_write(df, store_path, partition_keys, **kwargs)

    @staticmethod
    def coordinated_bundle_write(df: DataFrame, store_paths: Sequence[str],
                                 partition_keys: Sequence[str], **kwargs):
        from cassandra_analytics_spark.sinks.bundles import (
            coordinated_bundle_write,
        )

        return coordinated_bundle_write(df, store_paths, partition_keys, **kwargs)

    def restore_bundles(self, job_dir: str, table_path: str, **kwargs):
        from cassandra_analytics_spark.sinks.bundles import restore_bundles

        return restore_bundles(self.spark, job_dir, table_path, **kwargs)

    # -- Cassandra read semantics (M1/M5) --------------------------------
    compaction_merge = staticmethod(compaction_merge)
    latest_by_key = staticmethod(latest_by_key)
    last_modified_timestamp = staticmethod(last_modified_timestamp)
    propagate_static_columns = staticmethod(propagate_static_columns)

    # -- training-data pipeline (north-star extensions) -------------------
    @staticmethod
    def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
        from cassandra_analytics_spark.operators.graph import dedup_clusters

        return dedup_clusters(df, pairs, id_col=id_col)

    @staticmethod
    def keep_cluster_representatives(
        df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
    ) -> DataFrame:
        from cassandra_analytics_spark.operators.graph import (
            keep_cluster_representatives,
        )

        return keep_cluster_representatives(df, pairs, id_col=id_col)

    @staticmethod
    def tfidf_scores(df: DataFrame, query_terms: list[str], **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.text import tfidf_scores

        return tfidf_scores(df, query_terms, **kwargs)

    @staticmethod
    def bm25_scores(df: DataFrame, query_terms: list[str], **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.text import bm25_scores

        return bm25_scores(df, query_terms, **kwargs)

    @staticmethod
    def repetition_stats(df: DataFrame, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.text import repetition_stats

        return repetition_stats(df, **kwargs)

    @staticmethod
    def contamination_overlap(
        corpus: DataFrame, benchmark: DataFrame, **kwargs
    ) -> DataFrame:
        from cassandra_analytics_spark.operators.dedup import contamination_overlap

        return contamination_overlap(corpus, benchmark, **kwargs)

    @staticmethod
    def contamination_overlap_bloom(
        corpus: DataFrame, benchmark: DataFrame, **kwargs
    ) -> DataFrame:
        """Decontamination for eval suites too large to broadcast exactly:
        distributively-built Bloom prefilter + exact-join confirm (same
        result as contamination_overlap)."""
        from cassandra_analytics_spark.operators.dedup import (
            contamination_overlap_bloom,
        )

        return contamination_overlap_bloom(corpus, benchmark, **kwargs)

    @staticmethod
    def salted_aggregate(df: DataFrame, keys: Sequence[str], aggs: dict, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.skew import salted_aggregate

        return salted_aggregate(df, keys, aggs, **kwargs)

    def dedup_ingest_batch(self, index_table: str, new_df: DataFrame,
                           texts: DataFrame, **kwargs) -> DataFrame:
        """Incremental dedup recipe: LSH candidates vs the persistent
        bucketed index → exact-Jaccard confirm → append batch to index."""
        from cassandra_analytics_spark.operators.dedup_index import ingest_batch

        return ingest_batch(self.spark, index_table, new_df, texts, **kwargs)

    @staticmethod
    def build_dedup_index(df: DataFrame, index_table: str, **kwargs) -> None:
        from cassandra_analytics_spark.operators.dedup_index import build_index

        return build_index(df, index_table, **kwargs)

    @staticmethod
    def build_ivf_index(df: DataFrame, index_path: str, **kwargs):
        from cassandra_analytics_spark.operators.ann_index import build_ivf_index

        return build_ivf_index(df, index_path, **kwargs)

    def query_ivf_index(self, index_path: str, query_vec: list[float], **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.ann_index import query_ivf_index

        return query_ivf_index(self.spark, index_path, query_vec, **kwargs)

    def query_ivf_index_quantized(
        self, index_path: str, query_vec: list[float], **kwargs
    ) -> DataFrame:
        """Two-phase probe over a ``build_ivf_index(quantize=True)``
        layout: partition-pruned, ranks from int8 codes (~1 byte/dim
        scan), float-rescores top k·factor survivors."""
        from cassandra_analytics_spark.operators.ann_index import (
            query_ivf_index_quantized,
        )

        return query_ivf_index_quantized(
            self.spark, index_path, query_vec, **kwargs
        )

    @staticmethod
    def append_to_ivf_index(df: DataFrame, index_path: str, **kwargs) -> None:
        """Incremental extension of a persisted IVF layout — per-refresh
        cost ∝ batch, mode/sim pinned by the layout spec."""
        from cassandra_analytics_spark.operators.ann_index import (
            append_to_ivf_index,
        )

        return append_to_ivf_index(df, index_path, **kwargs)

    @staticmethod
    def ivf_knn_join(queries: DataFrame, index_path: str, k: int = 5,
                     **kwargs) -> DataFrame:
        """Index-accelerated k-NN join: top-k corpus neighbors for every
        query row, reading only the union of probe cells."""
        from cassandra_analytics_spark.operators.ann_index import ivf_knn_join

        return ivf_knn_join(queries, index_path, k, **kwargs)

    @staticmethod
    def build_ann_index(df: DataFrame, index_path: str, **kwargs) -> None:
        from cassandra_analytics_spark.operators.ann_index import build_ann_index

        return build_ann_index(df, index_path, **kwargs)

    @staticmethod
    def append_to_ann_index(df: DataFrame, index_path: str, **kwargs) -> None:
        from cassandra_analytics_spark.operators.ann_index import (
            append_to_ann_index,
        )

        return append_to_ann_index(df, index_path, **kwargs)

    def query_ann_index(self, index_path: str, query_vec: list[float],
                        **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.ann_index import query_ann_index

        return query_ann_index(self.spark, index_path, query_vec, **kwargs)

    # -- temporal joins ---------------------------------------------------
    @staticmethod
    def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                  left_ts: str, right_ts: str,
                  right_value_cols: Sequence[str] = (), **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.asof import asof_join

        return asof_join(
            left, right, on, left_ts, right_ts, right_value_cols, **kwargs
        )

    @staticmethod
    def range_join_pairs(df: DataFrame, key: str, ts: str, id_col: str,
                         max_gap_seconds: int) -> DataFrame:
        from cassandra_analytics_spark.operators.asof import range_join_pairs

        return range_join_pairs(df, key, ts, id_col, max_gap_seconds)

    # -- replica / partition semantics (M3/S3, M2) ------------------------
    @staticmethod
    def read_with_consistency(df: DataFrame, partition_keys: Sequence[str],
                              **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.replicas import (
            read_with_consistency,
        )

        return read_with_consistency(df, partition_keys, **kwargs)

    @staticmethod
    def select_replicas(df: DataFrame, partition_keys: Sequence[str],
                        **kwargs) -> DataFrame:
        """CL-many replica selection per partition — single-DC (int rf)
        or multi-DC (``rf`` map + ``dc_col``/``local_dc``)."""
        from cassandra_analytics_spark.operators.replicas import (
            select_replicas,
        )

        return select_replicas(df, partition_keys, **kwargs)

    @staticmethod
    def select_replicas_vnode(df: DataFrame, partition_keys: Sequence[str],
                              ring: Sequence[tuple], **kwargs) -> DataFrame:
        """Replica selection under TRUE per-DC vnode token ownership
        (CassandraRing.java:181-191) — ``ring`` is the cluster's vnode
        table; single-DC pairs or multi-DC triples."""
        from cassandra_analytics_spark.operators.replicas import (
            select_replicas_vnode,
        )

        return select_replicas_vnode(df, partition_keys, ring, **kwargs)

    @staticmethod
    def block_for(consistency: str, rf, local_dc: str | None = None) -> int:
        """Total replicas a read blocks for (per-DC rf maps supported)."""
        from cassandra_analytics_spark.operators.replicas import block_for

        return block_for(consistency, rf, local_dc)

    @staticmethod
    def write_consistency_satisfied(succeeded_dcs, pending_dcs,
                                    consistency: str, rf,
                                    local_dc: str | None = None) -> bool:
        """The bulk-write CL predicate with pending-instance inflation
        (bulkwriter canBeSatisfied parity)."""
        from cassandra_analytics_spark.operators.replicas import (
            write_consistency_satisfied,
        )

        return write_consistency_satisfied(
            succeeded_dcs, pending_dcs, consistency, rf, local_dc
        )

    @staticmethod
    def partition_sizes(df: DataFrame, partition_keys: Sequence[str],
                        **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.partition_stats import (
            partition_sizes,
        )

        return partition_sizes(df, partition_keys, **kwargs)

    @staticmethod
    def cell_pivot(cells: DataFrame, partition_keys: Sequence[str],
                   **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.cell_pivot import cell_pivot

        return cell_pivot(cells, partition_keys, **kwargs)

    # -- dedup pair generation --------------------------------------------
    @staticmethod
    def minhash_candidate_pairs(df: DataFrame, **kwargs) -> DataFrame:
        """RAW banded-LSH candidates (est_jaccard from signature
        agreement, unconfirmed) — use :meth:`minhash_near_dup_pairs` for
        exactly-confirmed pairs."""
        from cassandra_analytics_spark.operators.dedup import (
            minhash_lsh_candidates,
        )

        return minhash_lsh_candidates(df, **kwargs)

    @staticmethod
    def minhash_near_dup_pairs(
        df: DataFrame,
        threshold: float = 0.9,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
        **kwargs,
    ) -> DataFrame:
        """CONFIRMED near-dup pairs: banded-LSH candidates piped through
        the exact n-gram-Jaccard confirm — (a, b, jaccard >= threshold),
        matching the exactness of the sibling simhash_near_dup_pairs
        (whose hamming filter is its own exact confirm). The unconfirmed
        candidate stage is exposed as minhash_candidate_pairs
        (/code-review r7: the old name returned bucket collisions, so a
        dedup built on it deleted non-duplicates)."""
        from cassandra_analytics_spark.operators.dedup import (
            minhash_lsh_candidates,
        )
        from cassandra_analytics_spark.operators.dedup_index import (
            confirm_candidates,
        )

        cands = minhash_lsh_candidates(
            df, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            bands=bands, shingle_n=shingle_n, **kwargs,
        )
        return confirm_candidates(
            cands, df, shingle_n, threshold, id_col, text_col
        )

    @staticmethod
    def simhash_near_dup_pairs(df: DataFrame, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.dedup import (
            simhash_near_dup_pairs,
        )

        return simhash_near_dup_pairs(df, **kwargs)

    @staticmethod
    def ngram_jaccard_pairs(df: DataFrame, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(df, **kwargs)

    # -- embedding storage ------------------------------------------------
    @staticmethod
    def quantize_embeddings(df: DataFrame, **kwargs) -> DataFrame:
        """Affine int8 codes per vector (~4x smaller embedding storage;
        reconstruction error <= scale/2 per element)."""
        from cassandra_analytics_spark.operators.quantize import (
            quantize_embeddings,
        )

        return quantize_embeddings(df, **kwargs)

    @staticmethod
    def dequantize_embeddings(df: DataFrame, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.quantize import (
            dequantize_embeddings,
        )

        return dequantize_embeddings(df, **kwargs)

    @staticmethod
    def train_pq_codebook(df: DataFrame, **kwargs):
        """Per-subspace k-means PQ codebook (trained on a bounded
        sample, FAISS posture)."""
        from cassandra_analytics_spark.operators.pq import train_pq_codebook

        return train_pq_codebook(df, **kwargs)

    @staticmethod
    def pq_encode(df: DataFrame, codebook, **kwargs) -> DataFrame:
        """m one-byte PQ codewords + stored reconstructed norm per
        vector (Arrow-batched numpy encode)."""
        from cassandra_analytics_spark.operators.pq import pq_encode

        return pq_encode(df, codebook, **kwargs)

    @staticmethod
    def pq_adc_topk(qdf: DataFrame, codebook, query_vec: list[float],
                    k: int = 10, **kwargs) -> DataFrame:
        """Two-phase ADC cosine top-k over a PQ-encoded corpus
        (m table lookups per row, exact-rescore window)."""
        from cassandra_analytics_spark.operators.pq import pq_adc_topk

        return pq_adc_topk(qdf, codebook, query_vec, k, **kwargs)

    @staticmethod
    def save_pq_index(df: DataFrame, index_path: str, **kwargs):
        """Persist a PQ-encoded corpus + trained codebook + spec
        (the LSH/IVF layout discipline applied to PQ)."""
        from cassandra_analytics_spark.operators.pq import save_pq_index

        return save_pq_index(df, index_path, **kwargs)

    def query_pq_index(self, index_path: str, query_vec: list[float],
                       k: int = 10, **kwargs) -> DataFrame:
        """Top-k over a persisted PQ layout (ADC rank from m-byte
        codes, exact rescore from the layout's float column)."""
        from cassandra_analytics_spark.operators.pq import query_pq_index

        return query_pq_index(self.spark, index_path, query_vec, k,
                              **kwargs)

    @staticmethod
    def save_ivf_pq_index(df: DataFrame, index_path: str, **kwargs):
        """Persist the FAISS IVF-PQ composition: cell-partitioned AND
        PQ-encoded (partition-pruned, m-byte probes)."""
        from cassandra_analytics_spark.operators.pq import save_ivf_pq_index

        return save_ivf_pq_index(df, index_path, **kwargs)

    def query_ivf_pq_index(self, index_path: str, query_vec: list[float],
                           k: int = 10, **kwargs) -> DataFrame:
        """Partition-pruned ADC top-k over an IVF-PQ layout."""
        from cassandra_analytics_spark.operators.pq import query_ivf_pq_index

        return query_ivf_pq_index(self.spark, index_path, query_vec, k,
                                  **kwargs)

    @staticmethod
    def quantized_topk(qdf: DataFrame, query_vec: list[float], k: int = 10,
                       **kwargs) -> DataFrame:
        """Two-phase cosine top-k over int8 codes (phase-1 scan reads
        ~1/8 the bytes) with optional exact float rescore."""
        from cassandra_analytics_spark.operators.quantize import quantized_topk

        return quantized_topk(qdf, query_vec, k, **kwargs)

    # -- similarity search ------------------------------------------------
    @staticmethod
    def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.similarity import (
            brute_force_topk,
        )

        return brute_force_topk(df, query_vec, k, **kwargs)

    @staticmethod
    def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
                 **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.similarity import knn_join

        return knn_join(queries, corpus, k, **kwargs)

    # -- deterministic splitting / sampling / packing ---------------------
    @staticmethod
    def hash_split(df: DataFrame, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.sampling import hash_split

        return hash_split(df, **kwargs)

    @staticmethod
    def stratified_hash_sample(df: DataFrame, stratum_col: str, id_col: str,
                               fractions: dict) -> DataFrame:
        from cassandra_analytics_spark.operators.sampling import (
            stratified_hash_sample,
        )

        return stratified_hash_sample(df, stratum_col, id_col, fractions)

    @staticmethod
    def semantic_dedup(
        df: DataFrame, centroids: list, **kwargs
    ) -> DataFrame:
        from cassandra_analytics_spark.operators.similarity import semantic_dedup

        return semantic_dedup(df, centroids, **kwargs)

    def semantic_dedup_on_index(self, index_path: str, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.ann_index import (
            semantic_dedup_on_index,
        )

        return semantic_dedup_on_index(self.spark, index_path, **kwargs)

    @staticmethod
    def mixture_sample(df: DataFrame, weights: dict, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.sampling import mixture_sample

        return mixture_sample(df, weights, **kwargs)

    @staticmethod
    def reciprocal_rank_fusion(ranked: dict, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.text import reciprocal_rank_fusion

        return reciprocal_rank_fusion(ranked, **kwargs)

    @staticmethod
    def remove_repeated_segments(df: DataFrame, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.text import remove_repeated_segments

        return remove_repeated_segments(df, **kwargs)

    @staticmethod
    def chunk_layout(df: DataFrame, budget: int, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.packing import chunk_layout

        return chunk_layout(df, budget, **kwargs)

    @staticmethod
    def pack_greedy(df: DataFrame, budget: int, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.operators.packing import pack_greedy

        return pack_greedy(df, budget, **kwargs)

    # -- streaming entry points -------------------------------------------
    @staticmethod
    def stream_bulk_ingest(stream: DataFrame, table_path: str,
                           partition_keys: Sequence[str], **kwargs):
        from cassandra_analytics_spark.streaming.ingest import stream_bulk_ingest

        return stream_bulk_ingest(stream, table_path, partition_keys, **kwargs)

    @staticmethod
    def run_incremental_dedup_stream(stream: DataFrame, index_table: str,
                                     doc_store: str, pairs_out: str, **kwargs):
        from cassandra_analytics_spark.streaming.dedup_stream import (
            run_incremental_dedup_stream,
        )

        return run_incremental_dedup_stream(
            stream, index_table, doc_store, pairs_out, **kwargs
        )

    @staticmethod
    def run_semantic_dedup_stream(stream: DataFrame, index_path: str,
                                  pairs_out: str, centroids: list, **kwargs):
        """Streaming incremental SemDeDup over the persisted IVF layout
        (the embedding twin of run_incremental_dedup_stream)."""
        from cassandra_analytics_spark.streaming.semantic_stream import (
            run_semantic_dedup_stream,
        )

        return run_semantic_dedup_stream(
            stream, index_path, pairs_out, centroids, **kwargs
        )

    def collected_semantic_pairs(self, pairs_out: str, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.streaming.semantic_stream import (
            collected_semantic_pairs,
        )

        return collected_semantic_pairs(self.spark, pairs_out, **kwargs)

    def collected_dedup_pairs(self, pairs_out: str, **kwargs) -> DataFrame:
        from cassandra_analytics_spark.streaming.dedup_stream import (
            collected_pairs,
        )

        return collected_pairs(self.spark, pairs_out, **kwargs)
