"""Command-line interface.

Mirrors the reference wrapper's surface (``ipk.py:70-202``: same option names,
defaults, and validation) and folds the verification tools in as subcommands:

* ``build`` — compute a phylo-k-mer database (the one true entry point,
  SURVEY.md §3.1).
* ``diff``  — compare two databases; unlike the reference ``ipkdiff`` which
  always exits 0 (``tools/src/diff.cpp:115-116``), exits non-zero on mismatch.
* ``dump``  — plain-text dump in the reference's format: k-mer line, then
  per-entry "\\t<10^score>\\t<preorder id>" (``tools/src/dump.cpp:18-33``).

Unlike the reference there is no triple-binary dispatch: the alphabet is a
runtime parameter (``--states``), positions a flag.
"""

from __future__ import annotations

import json
import os
import sys

import click

from .ar.bridge import NUCL_MODELS, AMINO_MODELS

ALL_MODELS = NUCL_MODELS + AMINO_MODELS
KMER_FILTERS = ["mif0", "random"]
GHOST_STRATEGIES = ["inner-only", "outer-only", "both"]


def validate_filter(ctx, param, value):
    value = value.lower()
    if value not in KMER_FILTERS:
        raise click.BadParameter("Filter must be one of: " + ", ".join(KMER_FILTERS))
    return value


def validate_ghosts(ctx, param, value):
    value = value.lower()
    if value not in GHOST_STRATEGIES:
        raise click.BadParameter("Strategy must be one of: " + ", ".join(GHOST_STRATEGIES))
    return value


def validate_model(ctx, param, value):
    if ("ar_config" in ctx.params) or (value and value in ALL_MODELS):
        return value
    raise click.BadParameter(
        f"Please define a valid evolutionary model either via --model or in a "
        f"config file via --ar-config. Valid values: {ALL_MODELS}")


def parse_config(ar_config: str) -> str:
    """--ar-config JSON → raw --ar-parameters string (``ipk.py:241-250``)."""
    with open(ar_config) as f:
        content = json.load(f)
    if "arguments" not in content:
        raise RuntimeError(f"Error parsing {ar_config}: 'arguments' not found")
    return " ".join(f"--{k} {v}" for k, v in content["arguments"].items())


@click.group()
@click.version_option("0.1.0", prog_name="ipk-tpu")
def ipk():
    """IPK-TPU: TPU-native phylo-k-mer database construction."""
    from .utils.malloc_tune import retain_heap
    retain_heap()


@ipk.command()
@click.option("-b", "--ar", type=str, required=False,
              help="Path to the ancestral reconstruction binary (RAxML-ng), "
                   "or the literal 'native' to use the built-in TPU "
                   "ancestral reconstruction (GTR+G, empirical frequencies; "
                   "add --ar-optimize to ML-fit branch lengths and model "
                   "parameters on device).")
@click.option("-r", "--refalign", type=click.Path(exists=True), required=True,
              help="Reference multiple sequence alignment in FASTA format.")
@click.option("-t", "--reftree", type=click.Path(exists=True), required=True,
              help="Reference phylogenetic tree in Newick format.")
@click.option("-s", "--states", type=click.Choice(["nucl", "amino"]),
              default="nucl", show_default=True)
@click.option("-v", "--verbosity", type=int, default=1, show_default=True)
@click.option("-w", "--workdir", required=True,
              type=click.Path(dir_okay=True, file_okay=False))
@click.option("-a", "--alpha", type=float, default=1.0, show_default=True)
@click.option("-c", "--categories", type=int, default=4, show_default=True)
@click.option("-k", "--k", type=int, default=8, show_default=True)
@click.option("-m", "--model", type=click.UNPROCESSED, callback=validate_model,
              required=False)
@click.option("--convert-uo", is_flag=True,
              help="Convert U, O amino acids to C, L.")
@click.option("--write-reduction", type=click.Path(file_okay=True,
                                                   dir_okay=False),
              help="Write reduced alignment to file.")
@click.option("--bb", "algorithm", flag_value="BB",
              help="Use the branch-and-bound enumeration algorithm.")
@click.option("--dc", "algorithm", flag_value="DC",
              help="Use the divide-and-conquer enumeration algorithm.")
@click.option("--dcla", "algorithm", flag_value="DCLA", default=True,
              help="Use divide-and-conquer with lookahead (default).")
@click.option("--dccw", "algorithm", flag_value="DCCW",
              help="Use divide-and-conquer with chained windows.")
@click.option("--no-reduction", is_flag=True)
@click.option("--reduction-ratio", type=float, default=0.99, show_default=True)
@click.option("--omega", type=float, default=1.5, show_default=True)
@click.option("--filter", callback=validate_filter, default="mif0",
              show_default=True)
@click.option("-u", "--mu", type=float, default=1.0, show_default=True)
@click.option("--ghosts", callback=validate_ghosts, default="both",
              show_default=True)
@click.option("--use-unrooted", is_flag=True)
@click.option("--merge-branches", is_flag=True, default=False)
@click.option("--ar-dir", type=click.Path(exists=True, dir_okay=True,
                                          file_okay=False))
@click.option("--ar-only", is_flag=True, default=False, show_default=True)
@click.option("--ar-config", required=False, type=click.Path(exists=True))
@click.option("--ar-optimize", is_flag=True, default=False,
              help="With --ar native: ML-optimize branch lengths, GTR rates "
                   "and the Gamma shape before computing posteriors (the "
                   "native analog of raxml-ng's --opt-model/--opt-branches).")
@click.option("--ar-opt-steps", type=int, default=200, show_default=True,
              help="Gradient steps for --ar-optimize.")
@click.option("--keep-positions", is_flag=True, default=False)
@click.option("--uncompressed", is_flag=True, default=False)
@click.option("--threads", type=int, default=0, show_default=True,
              help="Host threads for the native filter, deflate and gather "
                   "pools AND the AR subprocess. 0 = auto (all cores). The "
                   "reference forwards --threads to AR only; here N pins "
                   "every host pool (env IPK_TPU_THREADS overrides).")
@click.option("--output", "-o", help="Output file name")
@click.option("--on-disk", is_flag=True, default=False, show_default=True)
@click.option("--max-candidates", type=int, default=4096, show_default=True,
              help="Per-window survivor-list capacity on the large-k path; "
                   "the build fails loudly if exceeded.")
@click.option("--profile", "profile_dir", type=click.Path(), default="",
              help="Write a jax.profiler device trace of the build to DIR "
                   "(view with TensorBoard / xprof).")
@click.option("--device-mi", is_flag=True, default=False,
              help="Compute the mif0 filter on device via collective "
                   "reductions (f32) instead of the host f64 pass - for "
                   "pod-scale builds where the entry set should not be "
                   "gathered to one host.")
@click.option("--coordinator", default="",
              help="Multi-host: coordinator address host:port for "
                   "jax.distributed (same on every host).")
@click.option("--num-hosts", type=int, default=0,
              help="Multi-host: total number of processes in the job.")
@click.option("--host-id", type=int, default=-1,
              help="Multi-host: this process's id in [0, num-hosts).")
def build(ar, refalign, reftree, states, verbosity, workdir, alpha, categories,
          k, model, convert_uo, write_reduction, algorithm, no_reduction,
          reduction_ratio, omega, filter, mu, ghosts, use_unrooted,
          merge_branches, ar_dir, ar_only, ar_config, ar_optimize,
          ar_opt_steps, keep_positions, uncompressed, threads, output,
          on_disk, max_candidates, profile_dir, device_mi, coordinator,
          num_hosts, host_id):
    """Compute a database of phylo-k-mers."""
    if num_hosts and num_hosts > 1:
        # must run before the first device query (jax.distributed contract)
        from .parallel.mesh import initialize_distributed
        initialize_distributed(coordinator=coordinator or None,
                               num_processes=num_hosts,
                               process_id=host_id if host_id >= 0 else None)
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from .pipeline import BuildParams, build_database
    if states == "nucl" and keep_positions:
        raise click.ClickException("--keep-positions is not supported for DNA.")
    params = BuildParams(
        refalign=refalign, reftree=reftree, states=states,
        working_dir=workdir,
        output_filename=output or os.path.join(workdir, "DB.ipk"),
        ar_binary=ar or "", ar_dir=ar_dir or "",
        ar_parameters=parse_config(ar_config) if ar_config else "",
        ar_only=ar_only, ar_optimize=ar_optimize, ar_opt_steps=ar_opt_steps,
        model=model or "GTR", alpha=alpha,
        categories=categories, kmer_size=k, omega=omega, mu=mu,
        reduction_ratio=reduction_ratio, no_reduction=no_reduction,
        filter=filter, ghosts=ghosts, use_unrooted=use_unrooted,
        merge_branches=merge_branches, keep_positions=keep_positions,
        uncompressed=uncompressed, on_disk=on_disk, num_threads=threads,
        algorithm=algorithm or "DCLA", convert_uo=convert_uo,
        write_reduction=write_reduction or "",
        max_candidates=max_candidates, profile_dir=profile_dir,
        device_mi=device_mi, verbosity=verbosity)
    build_database(params)


@ipk.command()
@click.argument("db1", type=click.Path(exists=True))
@click.argument("db2", type=click.Path(exists=True))
@click.option("--verbose", is_flag=True, default=False)
@click.option("--eps", type=float, default=0.0, show_default=True,
              help="Score tolerance; 0 = exact (reference ipkdiff uses 1e-2).")
def diff(db1, db2, verbose, eps):
    """Compare two databases field by field; exit 1 on any difference."""
    from .tools import diff_databases
    ok = diff_databases(db1, db2, verbose=verbose, eps=eps)
    sys.exit(0 if ok else 1)


@ipk.command()
@click.argument("database", type=click.Path(exists=True))
def dump(database):
    """Plain-text dump (format of the reference ipkdump, dump.cpp:18-33)."""
    from .tools import dump_database
    dump_database(database, sys.stdout)


@ipk.command()
@click.argument("database", type=click.Path(exists=True))
@click.argument("queries", type=click.Path(exists=True))
@click.option("-o", "--output", required=True, help="Output .jplace file")
@click.option("--top", type=int, default=7, show_default=True,
              help="Number of best branches reported per query.")
def place(database, queries, output, top):
    """Place query sequences (FASTA) against a database; writes jplace v3."""
    from . import serialize
    from .alignment import read_fasta
    from .placement import place_queries, write_jplace
    db = serialize.load(database)
    placements = place_queries(db, read_fasta(queries), top=top)
    write_jplace(db, placements, output)
    print(f"Placed {len(placements)} queries -> {output}")


@ipk.command("diff-text")
@click.argument("db1", type=click.Path(exists=True))
@click.argument("db2", type=click.Path(exists=True))
@click.option("--eps", type=float, default=1e-3, show_default=True,
              help="Linear-space score tolerance.")
def diff_text(db1, db2, eps):
    """Tolerant comparison ignoring threshold-boundary k-mers (the
    diff-plain-text.py analog); exit 1 on differences."""
    from .tools import diff_plain_text
    sys.exit(0 if diff_plain_text(db1, db2, eps=eps) else 1)


if __name__ == "__main__":
    ipk()
