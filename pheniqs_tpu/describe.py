"""`--validate` pretty printer, byte-compatible with the reference
(reference transcode.cpp:1944-2283; golden test/BDGGG/valid/validate_*.out).

Layout: Environment, Input (+input feeds), Output transform, Sample /
Molecular / Cellular decoding blocks (with optional pairwise barcode
distance matrices under --distance, reference metric.h:59-111), then the
output feeds.
"""

from __future__ import annotations

from .config.url import URL
from .transform import Rule


def _g(value) -> str:
    """C++ `ostream << double` at precision 15 (general format)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    return f"{float(value):.15g}"


def _row(label: str, value) -> str:
    return f"    {label:<44}{value}\n"


def _row_list(label: str, values) -> str:
    return f"    {label:<43}" + "".join(f" {v}" for v in values) + "\n"


def _token_description(token) -> str:
    out = f"cycles {token.start} to "
    out += str(token.end) if token.end_terminated else "end"
    if token.input_segment_index < 0:
        name = {-1: "sample", -2: "cellular", -3: "molecular"}[
            token.input_segment_index
        ]
        out += f" of decoded {name} barcode"
    else:
        out += f" of input segment {token.input_segment_index}"
    return out


def _transform_description(tx) -> str:
    out = "Append "
    out += "reverse complemented token " if tx.reverse_complement else "token "
    out += str(tx.token.index)
    if tx.token.input_segment_index < 0:
        name = {-1: "sample", -2: "cellular", -3: "molecular"}[
            tx.token.input_segment_index
        ]
        out += f" of decoded {name} barcode"
    else:
        out += f" of input segment {tx.token.input_segment_index}"
    out += f" to output segment {tx.output_segment_index}"
    return out


def _print_rule(w, rule: Rule, indent: str):
    w("\n")
    for token in rule.token_array:
        w(f"{indent}Token No.{token.index}\n")
        length = token.length() if token.constant() else None
        w(
            f"{indent}    Length        "
            + (str(length) if length is not None else "variable")
            + "\n"
        )
        w(f"{indent}    Pattern       {token}\n")
        w(f"{indent}    Description   {_token_description(token)}\n")
        w("\n")
    w(f"{indent}Assembly instruction\n")
    for tx in rule.transform_array:
        w(f"{indent}    {_transform_description(tx)}\n")
    w("\n")


def _hamming(left: str, right: str) -> int:
    return sum(1 for a, b in zip(left, right) if a != b)


def _print_distance_matrix(w, decoder: dict):
    """Pairwise barcode word metric per segment: upper triangle Hamming
    distance, lower triangle Shannon bound (d-1)/2, aligned columns
    (reference metric.h:59-111)."""
    codec = decoder.get("codec")
    if not codec:
        return
    barcodes = [entry.get("barcode", []) for entry in codec.values()]
    if not barcodes or not barcodes[0]:
        return
    segment_cardinality = len(barcodes[0])
    w("    Hamming distance distribution\n\n")
    for segment in range(segment_cardinality):
        words = [b[segment] for b in barcodes]
        length = len(words[0])
        padding = 1
        digit = length
        while True:
            digit //= 10
            padding += 1
            if digit == 0:
                break
        w(f"    Segment No.{segment}\n\n")
        for i, row in enumerate(words):
            line = "   "
            for j, column in enumerate(words):
                if i < j:
                    cell = str(_hamming(row, column))
                elif i > j:
                    cell = str((_hamming(row, column) - 1) // 2)
                else:
                    cell = "0"
                line += cell.rjust(padding)
            w(line + " " + row + "\n")


def _print_channel(w, key: str, value: dict):
    if not isinstance(value, dict):
        return
    w(f"    Barcode {key}\n")
    for field in (
        "ID", "PU", "LB", "SM", "DS", "DT", "PL", "PM", "CN", "FO", "KS",
        "PI", "FS", "CO",
    ):
        if field in value and value[field] not in (None, ""):
            w(f"        {field} : {value[field]}\n")
    if int(value.get("index", 0)) > 0:
        if "concentration" in value:
            w(f"        Concentration : {_g(value['concentration'])}\n")
        barcode = value.get("barcode")
        if barcode:
            w(f"        Barcode       : {'-'.join(barcode)}\n")
    for segment_index, url in enumerate(value.get("output", []) or []):
        w(f"        Segment No.{segment_index}  : {url}\n")
    w("\n")


def _print_codec(w, decoder: dict, plural: bool, display_distance: bool):
    if plural and "index" in decoder:
        w(f"  Decoder No.{decoder['index']}\n\n")
    algorithm = decoder.get("algorithm", "unknown")
    w(_row("Decoding algorithm", algorithm))
    qmt = int(decoder.get("quality masking threshold", 0) or 0)
    if qmt > 0:
        w(_row("Quality masking threshold", qmt))
    if "shannon bound" in decoder:
        w(_row_list("Shannon bound", decoder["shannon bound"]))
    if algorithm == "mdd" and "distance tolerance" in decoder:
        w(_row_list("Distance tolerance", decoder["distance tolerance"]))
    if algorithm == "pamld":
        w(_row("Noise", _g(decoder.get("noise", 0.0))))
        w(
            _row(
                "Confidence threshold",
                _g(decoder.get("confidence threshold", 0.0)),
            )
        )
    segment_cardinality = int(decoder.get("segment cardinality", 0))
    if segment_cardinality > 0:
        w(_row("Segment cardinality", segment_cardinality))
        if "nucleotide cardinality" in decoder:
            w(_row("Nucleotide cardinality", decoder["nucleotide cardinality"]))
        if segment_cardinality > 1 and "barcode length" in decoder:
            w(
                f"    {'Barcode segment length':<44}"
                + "".join(f"{v} " for v in decoder["barcode length"])
                + "\n"
            )
        w("\n    Transform\n")
        if "transform" in decoder:
            rule = Rule.from_ontology(decoder["transform"])
            _print_rule(w, rule, "        ")
            if display_distance:
                _print_distance_matrix(w, decoder)
    w("\n")
    if "undetermined" in decoder:
        _print_channel(w, "undetermined", decoder["undetermined"])
    codec = decoder.get("codec")
    if isinstance(codec, dict):
        for key, value in codec.items():
            _print_channel(w, key, value)


def _print_codec_group(w, ontology: dict, topic: str, head: str, display_distance):
    node = ontology.get(topic)
    if node is None:
        return
    w(f"{head}\n\n")
    if isinstance(node, dict):
        _print_codec(w, node, False, display_distance)
    elif isinstance(node, list):
        plural = len(node) > 1
        for decoder in node:
            if decoder is not None:
                _print_codec(w, decoder, plural, display_distance)


def _print_feeds(w, ontology: dict, key: str):
    for element in (ontology.get("feed", {}) or {}).get(key, []) or []:
        direction = element.get("direction")
        url = URL(element["url"])
        if direction == "in":
            w(f"    Input feed No.{element['index']}\n")
            w(f"        Type : {url.format_type}\n")
            if url.compression != "none":
                w(f"        Compression : {url.compression or 'unknown'}\n")
        else:
            w(f"    Output feed No.{element['index']}\n")
            w(f"        Type : {url.format_type}\n")
            if url.compression not in ("none", None):
                level = url.compression_level
                w(
                    f"        Compression : {url.compression}@"
                    f"{level if level is not None else 'unknown'}\n"
                )
        w(f"        Resolution : {element['resolution']}\n")
        w(f"        Phred offset : {element['phred offset']}\n")
        w(f"        Platform : {element['platform']}\n")
        w(f"        Buffer capacity : {element['capacity']}\n")
        w(f"        URL : {element['url']}\n")
        w("\n")


def describe_instruction(ontology: dict, stream, display_distance: bool = False):
    w = stream.write

    # --- Environment (reference print_global_instruction)
    w("Environment \n\n")
    w(_row("Base input URL", ontology.get("base input url", "")))
    # the reference prints base *input* url under both labels
    # (transcode.cpp:1962, reads "base input url" twice)
    w(_row("Base output URL", ontology.get("base input url", "")))
    w(_row("Platform", ontology.get("platform", "")))
    w(
        _row(
            "Quality tracking",
            "enabled" if ontology.get("enable quality control") else "disabled",
        )
    )
    if "min input length" in ontology:
        w(_row_list("Min input length", ontology["min input length"]))
    w(
        _row(
            "Filter incoming QC failed reads",
            "enabled" if ontology.get("filter incoming qc fail") else "disabled",
        )
    )
    w(
        _row(
            "Filter outgoing QC failed reads",
            "enabled" if ontology.get("filter outgoing qc fail") else "disabled",
        )
    )
    w(_row("Input Phred offset", ontology.get("input phred offset", 33)))
    w(_row("Output Phred offset", ontology.get("output phred offset", 33)))
    w(_row("Leading segment index", ontology.get("leading segment index", 0)))
    w(_row("Default output format", ontology.get("default output format", "")))
    w(
        _row(
            "Default output compression",
            ontology.get("default output compression", ""),
        )
    )
    w(
        _row(
            "Default output compression level",
            ontology.get("default output compression level", ""),
        )
    )
    w(_row("Feed buffer capacity", ontology.get("buffer capacity", "")))
    w(_row("Threads", ontology.get("threads", "")))
    w(_row("Decoding threads", ontology.get("decoding threads", "")))
    w(_row("HTSLib threads", ontology.get("htslib threads", "")))
    w("\n")

    # --- Input (reference print_input_instruction)
    w("Input \n\n")
    if "input segment cardinality" in ontology:
        w(_row("Input segment cardinality", ontology["input segment cardinality"]))
    urls = ontology.get("input", [])
    if urls:
        w("\n")
        for index, url in enumerate(urls):
            w(f"    Input segment No.{index} : {url}\n")
        w("\n")
    _print_feeds(w, ontology, "input feed")

    # --- Output transform (reference print_transform_instruction)
    w("Output transform\n\n")
    if "output segment cardinality" in ontology:
        w(_row("Output segment cardinality", ontology["output segment cardinality"]))
    rule = Rule.from_ontology(
        ontology["template"]["transform"], allow_virtual=True
    )
    _print_rule(w, rule, "    ")

    _print_codec_group(w, ontology, "sample", "Sample decoding", display_distance)
    _print_codec_group(
        w, ontology, "molecular", "Molecular decoding", display_distance
    )
    _print_codec_group(
        w, ontology, "cellular", "Cellular decoding", display_distance
    )
    _print_feeds(w, ontology, "output feed")
