"""The instruction compiler: turns a user job document plus the built-in
configuration into a fully materialized, executable instruction ("compiled
ontology").

This reproduces the reference's configuration compilation semantics exactly
(reference job.cpp:40-224, transcode.cpp:323-1500): recursive `import`
merging, decoder-repository `base` inheritance with cycle detection,
per-topic projection defaults, undetermined-barcode synthesis, concentration
normalization to `1 - noise`, PU/ID inference, multiplexing-decoder
election, output channel compilation, and the codec distance metrics — the
compiled document determines barcode indices and therefore channel routing
and report layout, so it must be bit-compatible.
"""

from __future__ import annotations

import math

from ..errors import (
    CommandLineError,
    ConfigurationError,
    InternalError,
)
from ..transform import Rule
from .jsonkit import (
    clean_json,
    clean_json_object,
    merge_json,
    overlay_json,
    project_json,
    remove_disabled,
    sort_json,
)
from .url import (
    URL,
    expand_shell,
    normalize_standard_stream,
    relocate_url_array_by_key,
    relocate_url_by_key,
    standardize_url_array_by_key,
    standardize_url_value_by_key,
)

TOPICS = ("sample", "molecular", "cellular")


def topic_elements(node) -> list[dict]:
    """The decoder dicts of a molecular/cellular topic, accepting both
    the single-object and array shapes (the reference loads either —
    transcode.cpp:126-140 load_cellular_decoding IsObject/IsArray)."""
    if isinstance(node, dict):
        return [node]
    if isinstance(node, list):
        return [element for element in node if isinstance(element, dict)]
    return []


# ---------------------------------------------------------------------------
# instruction loading: imports
# ---------------------------------------------------------------------------

def load_instruction(url: URL | str) -> dict:
    """Load a job document, resolving recursive `import` members relative to
    the importing document with cycle protection (reference job.cpp:167-224)."""
    import json

    if isinstance(url, str):
        buffer = expand_shell(url)
        buffer = normalize_standard_stream(buffer, "in")
        url = URL(buffer)
    visited: set[str] = set()

    def load(url: URL) -> dict:
        if not url.is_readable():
            raise ConfigurationError(
                f"unable to read instruction file from {url.path}"
            )
        try:
            with open(url.path if not url.is_stdin() else 0) as stream:
                document = json.load(stream)
        except json.JSONDecodeError as error:
            raise ConfigurationError(f"{error.msg} at position {error.pos}")
        if not isinstance(document, dict):
            raise ConfigurationError("instruction root must be a dictionary")
        visited.add(url.path)
        imports = document.pop("import", None)
        if imports:
            if isinstance(imports, str):
                imports = [imports]
            aggregated: dict | None = None
            for record in imports:
                import_url = URL(expand_shell(str(record)))
                import_url.relocate_sibling(url)
                if import_url.path not in visited:
                    imported = load(import_url)
                    imported = merge_json(aggregated, imported)
                    aggregated = imported
            document = merge_json(aggregated, document)
        return document

    return load(url)


# ---------------------------------------------------------------------------
# inheritance
# ---------------------------------------------------------------------------

def _compute_inheritance_depth(key, object_by_key, depth_by_key, chain=()):
    if key in depth_by_key:
        return depth_by_key[key]
    if key not in object_by_key:
        raise ConfigurationError(f"referencing an unknown parent {key}")
    value = object_by_key[key]
    base = value.get("base")
    if base is None:
        depth_by_key[key] = 0
        return 0
    if base == key or key in chain:
        raise ConfigurationError(f"{key} references itself as parent")
    depth = _compute_inheritance_depth(base, object_by_key, depth_by_key, chain + (key,)) + 1
    depth_by_key[key] = depth
    return depth


def apply_repository_inheritance(container: dict, key: str = "decoder"):
    """Resolve `base` chains inside the decoder repository in depth order."""
    repository = container.get(key)
    if not isinstance(repository, dict):
        return
    object_by_key = {k: v for k, v in repository.items() if v is not None}
    depth_by_key: dict[str, int] = {}
    max_depth = 0
    for name in object_by_key:
        try:
            max_depth = max(
                max_depth,
                _compute_inheritance_depth(name, object_by_key, depth_by_key),
            )
        except ConfigurationError as error:
            raise CommandLineError(f"{name} is {error.message}")
    for depth in range(1, max_depth + 1):
        for name, value in object_by_key.items():
            if depth_by_key.get(name) == depth:
                base = value.pop("base", None)
                if base is not None:
                    merged = merge_json(object_by_key[base], value)
                    value.clear()
                    value.update(merged)
                    repository[name] = value
                    object_by_key[name] = value


def apply_decoder_inheritance(value: dict, repository: dict | None):
    if not isinstance(value, dict):
        return value
    base = value.pop("base", None)
    if base is not None and repository is not None:
        if base not in repository:
            raise ConfigurationError(f"reference to an unknown base {base}")
        value = merge_json(repository[base], value)
    return clean_json(value)


def apply_inheritance(instruction: dict) -> dict:
    """Reference Transcode::apply_inheritance (transcode.cpp:328-443)."""
    apply_repository_inheritance(instruction)
    repository = instruction.get("decoder")
    for topic in TOPICS:
        node = instruction.get(topic)
        if node is None:
            continue
        if isinstance(node, dict):
            try:
                instruction[topic] = apply_decoder_inheritance(node, repository)
            except ConfigurationError as error:
                raise ConfigurationError(f"{topic} decoder : {error.message}")
        elif isinstance(node, list):
            resolved = []
            for index, element in enumerate(node):
                try:
                    resolved.append(apply_decoder_inheritance(element, repository))
                except ConfigurationError as error:
                    raise ConfigurationError(
                        f"{topic} decoder at {index} : {error.message}"
                    )
            instruction[topic] = resolved

    if "transform" in instruction:
        template = instruction.setdefault("template", {})
        template.setdefault("transform", {})
        template["transform"] = merge_json(
            instruction["transform"], template["transform"]
        )

    instruction.pop("decoder", None)
    return sort_json(instruction)


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------

class InstructionCompiler:
    """Compiles one `mux` operation into an executable ontology.

    `operation` is the document assembled by the CLI: the action node plus
    an `interactive` member with the parsed command-line arguments.
    """

    def __init__(self, operation: dict):
        self.operation = operation
        self.interactive = operation.get("interactive", {})
        self.projection_repository = operation.get("projection", {})
        self.instruction: dict = {}
        self.ontology: dict = {}
        self.decoded_nucleotide_cardinality = 0

    # --- lifecycle ---------------------------------------------------------
    def assemble(self):
        configuration_url = self.interactive.get("configuration url")
        if configuration_url:
            self.instruction = load_instruction(configuration_url)
        self.instruction = apply_inheritance(self.instruction)
        self.instruction = clean_json_object(self.instruction)

    def compile(self) -> dict:
        ontology = remove_disabled(_deep_copy(self.instruction))
        ontology = clean_json_object(ontology)
        for key in (
            "feed",
            "input segment cardinality",
            "output segment cardinality",
            "program",
        ):
            ontology.pop(key, None)

        # overlay defaults, then interactive parameters
        default = self.operation.get("default")
        if default is not None:
            ontology = merge_json(default, ontology)
        ontology = self.apply_interactive_ontology(ontology)

        self.ontology = ontology
        self.compile_PG()
        ontology["feed"] = {}
        self.compile_input()
        self.compile_barcode_decoding()
        self.compile_multiplexing_decoder()
        self.compile_output()
        self.compile_thread_model()
        self.ontology = clean_json_object(self.ontology)
        self.validate()
        return self.ontology

    def apply_interactive_ontology(self, document: dict) -> dict:
        adjusted = _deep_copy(self.interactive)
        for key in ("configuration url", "static only", "validate only", "compile only"):
            adjusted.pop(key, None)
        token = adjusted.pop("template token", None)
        if token is not None:
            adjusted["template"] = {"transform": {"token": token}}
        return overlay_json(document, adjusted)

    def find_projection(self, key: str):
        value = self.projection_repository.get(key)
        return value if isinstance(value, dict) else None

    # --- PG ------------------------------------------------------------------
    def compile_PG(self):
        program = {}
        ontology = self.ontology
        if "application name" in ontology:
            program["ID"] = ontology["application name"]
            program["PN"] = ontology["application name"]
        if "full command" in ontology:
            program["CL"] = ontology["full command"]
        if "previous application" in ontology:
            program["PP"] = ontology["previous application"]
        if "application description" in ontology:
            program["DS"] = ontology["application description"]
        if "application version" in ontology:
            program["VN"] = ontology["application version"]
        ontology["program"] = program

    # --- input -----------------------------------------------------------------
    def compile_input(self):
        ontology = self.ontology
        total_threads = int(ontology.get("threads", 1))
        if "htslib threads" not in ontology:
            ontology["htslib threads"] = max(1, total_threads)

        standardize_url_value_by_key("base input url", ontology, "in")
        base = URL(ontology.get("base input url", ""))

        standardize_url_array_by_key("input", ontology, "in")
        relocate_url_array_by_key("input", ontology, base)

        # consolidate query parameters across references to the same path
        url_by_path: dict[str, URL] = {}
        feed_urls = [URL(encoded) for encoded in ontology.get("input", [])]
        for url in feed_urls:
            if url.path not in url_by_path:
                url_by_path[url.path] = url.copy()
            else:
                url_by_path[url.path].override_query(url)
        feed_urls = [url_by_path[url.path] for url in feed_urls]
        ontology["input"] = [url.encoded for url in feed_urls]

        if self.interactive.get("sense input layout") or ontology.get(
            "sense input layout"
        ):
            self.compile_sensed_input()
        else:
            self.compile_explicit_input()

        cardinality = int(ontology["input segment cardinality"])
        leading = int(ontology.get("leading segment index", 0))
        if leading >= cardinality:
            raise ConfigurationError(
                f"leading segment index {leading} references non existing input segment"
            )
        min_input_length = ontology.get("min input length")
        if min_input_length is not None:
            if len(min_input_length) != cardinality:
                raise ConfigurationError(
                    f"min input length has {len(min_input_length)} elements. "
                    f"must have {cardinality} elements, same as the number of "
                    "input segments. Use a value of 0 to skip filtering a "
                    "segment by length."
                )
        else:
            ontology["min input length"] = [0] * cardinality

    def _make_feed_proxy(self, index: int, url: URL, direction: str, resolution: int):
        ontology = self.ontology
        return {
            "index": index,
            "url": url.encoded,
            "direction": direction,
            "platform": ontology.get("platform", "ILLUMINA"),
            "capacity": int(ontology.get("buffer capacity", 2048)) * (resolution if direction == "out" else 1),
            "resolution": resolution,
            "phred offset": ontology.get(
                "input phred offset" if direction == "in" else "output phred offset", 33
            ),
        }

    def compile_explicit_input(self):
        ontology = self.ontology
        explicit = [URL(encoded) for encoded in ontology.get("input", [])]
        ontology["input segment cardinality"] = len(explicit)

        feed_url_by_index: list[URL] = []
        feed_resolution: dict[str, int] = {}
        for url in explicit:
            if url.encoded not in feed_resolution:
                feed_resolution[url.encoded] = 1
                feed_url_by_index.append(url)
            else:
                feed_resolution[url.encoded] += 1

        proxy_by_url: dict[str, dict] = {}
        for index, url in enumerate(feed_url_by_index):
            proxy = {
                "index": index,
                "url": url.encoded,
                "direction": "in",
                "platform": ontology.get("platform", "ILLUMINA"),
                "capacity": int(ontology.get("buffer capacity", 2048)),
                "resolution": feed_resolution[url.encoded],
                "phred offset": ontology.get("input phred offset", 33),
            }
            proxy_by_url[url.encoded] = proxy

        ontology["feed"]["input feed by segment"] = [
            _deep_copy(proxy_by_url[url.encoded]) for url in explicit
        ]
        ontology["feed"]["input feed"] = [
            proxy_by_url[url.encoded] for url in feed_url_by_index
        ]

    def compile_sensed_input(self):
        """Detect per-feed interleaving resolution by counting consecutive
        records with the same read id (reference transcode.cpp:559-682)."""
        from ..io.fastq import sense_resolution

        ontology = self.ontology
        explicit = [URL(encoded) for encoded in ontology.get("input", [])]
        seen: dict[str, URL] = {}
        unique: list[URL] = []
        for url in explicit:
            if url.encoded not in seen:
                seen[url.encoded] = url
                unique.append(url)

        cardinality = 0
        proxies = []
        segment_urls: list[URL] = []
        for index, url in enumerate(unique):
            if url.is_dev_null():
                raise ConfigurationError("/dev/null can not be used for input")
            fmt = url.format_type or "fastq"
            if fmt in ("sam", "bam", "cram"):
                # HTS feeds declare their cardinality in flags/TC
                # (reference transcode.cpp:559-682 via total_segments)
                from ..io.hts import hts_record_reader

                reader = hts_record_reader(url.path, fmt)
                try:
                    first = next(iter(reader), None)
                finally:
                    close = getattr(reader, "close", None)
                    if close:
                        close()
                resolution = first.total_segments if first is not None else 1
            else:
                resolution = sense_resolution(
                    url.path, int(ontology.get("input phred offset", 33))
                )
            proxy = {
                "index": index,
                "url": url.encoded,
                "direction": "in",
                "platform": ontology.get("platform", "ILLUMINA"),
                "capacity": int(ontology.get("buffer capacity", 2048)),
                "resolution": resolution,
                "phred offset": ontology.get("input phred offset", 33),
            }
            proxies.append(proxy)
            cardinality += resolution
            segment_urls.extend([url] * resolution)

        ontology["input segment cardinality"] = cardinality
        ontology["input"] = [url.encoded for url in segment_urls]
        ontology["feed"]["input feed"] = proxies
        proxy_by_url = {p["url"]: p for p in proxies}
        ontology["feed"]["input feed by segment"] = [
            _deep_copy(proxy_by_url[url.encoded]) for url in segment_urls
        ]
        # engine-internal marker: the layout above came from head-probe
        # sensing, so sync errors can blame the sensing (stripped from the
        # --compile document for reference byte-parity)
        ontology["feed"]["sensed"] = True

    # --- transformations ------------------------------------------------------
    def compile_transformation(self, value: dict):
        """Synthesize the default knit (one token per output segment) when
        missing (reference transcode.cpp:736-763)."""
        transform = value.get("transform")
        if not isinstance(transform, dict):
            return
        token = transform.get("token")
        if token is None:
            raise ConfigurationError("transform element is missing a token array")
        if not isinstance(token, list):
            raise ConfigurationError("transform token element is not an array")
        knit = transform.get("knit")
        if knit is None or knit == []:
            transform["knit"] = [str(i) for i in range(len(token))]

    def compile_decoder_transformation(self, value: dict):
        if "transform" not in value:
            return
        self.compile_transformation(value)
        rule = Rule.from_ontology(value["transform"])
        cardinality = int(self.ontology["input segment cardinality"])
        for token in rule.token_array:
            if token.input_segment_index >= cardinality:
                raise ConfigurationError(
                    f"invalid input feed reference {token.input_segment_index} "
                    f"in token {token.index}"
                )
            if token.empty():
                raise ConfigurationError(f"token {token} is empty")
            if not token.constant():
                raise ConfigurationError(f"token {token} is not fixed width")

        nucleotide_cardinality = 0
        barcode_length = [0] * rule.output_segment_cardinality
        for tx in rule.transform_array:
            barcode_length[tx.output_segment_index] += tx.token.length()
            nucleotide_cardinality += tx.token.length()
        value["segment cardinality"] = rule.output_segment_cardinality
        value["nucleotide cardinality"] = nucleotide_cardinality
        value["barcode length"] = barcode_length

        lower_bound = 1.0 / float(pow(4, nucleotide_cardinality))
        if value.get("random barcode probability") is not None:
            if float(value["random barcode probability"]) < lower_bound:
                raise ConfigurationError(
                    "random barcode probability is smaller than lower bound"
                )
        else:
            value["random barcode probability"] = lower_bound

        undetermined = value.get("undetermined")
        if undetermined is not None:
            undetermined["barcode"] = ["=" * length for length in barcode_length]
            undetermined["segment cardinality"] = rule.output_segment_cardinality

        codec = value.get("codec")
        if isinstance(codec, dict):
            unique: set[str] = set()
            for key, record in codec.items():
                barcode = record.get("barcode")
                if barcode is not None:
                    if len(barcode) != len(barcode_length):
                        raise ConfigurationError(
                            f"expected {len(barcode_length)} segments but found "
                            f"{len(barcode)} in barcode {key}"
                        )
                    sequence = ""
                    for segment_index, segment in enumerate(barcode):
                        if len(segment) != barcode_length[segment_index]:
                            raise ConfigurationError(
                                f"expected {barcode_length[segment_index]} but "
                                f"found {len(segment)} nucleotides in segment "
                                f"{segment_index} of barcode {key}"
                            )
                        sequence += segment
                    if sequence in unique:
                        raise ConfigurationError(
                            f"duplicate barcode sequence {sequence}"
                        )
                    unique.add(sequence)
                record["segment cardinality"] = rule.output_segment_cardinality

    # --- barcode decoding -------------------------------------------------------
    def compile_barcode_decoding(self):
        for topic in TOPICS:
            self.compile_topic(topic)

    def compile_topic(self, topic: str):
        ontology = self.ontology
        node = ontology.get(topic)
        if node is None:
            return

        decoder_template = {}
        projection = self.find_projection(f"{topic}:decoder")
        if projection is not None:
            decoder_template = merge_json(projection, decoder_template)
        default_decoder = project_json(decoder_template, ontology) or {}

        barcode_template = {}
        projection = self.find_projection(f"{topic}:barcode")
        if projection is not None:
            barcode_template = merge_json(projection, barcode_template)
        default_barcode = project_json(barcode_template, ontology) or {}

        if isinstance(node, dict):
            try:
                ontology[topic] = self.compile_decoder(
                    node, 0, default_decoder, default_barcode
                )
            except ConfigurationError as error:
                raise ConfigurationError(f"{topic} decoder : {error.message}")
        elif isinstance(node, list):
            compiled = []
            for index, element in enumerate(node):
                try:
                    compiled.append(
                        self.compile_decoder(
                            element, index, default_decoder, default_barcode
                        )
                    )
                except ConfigurationError as error:
                    raise ConfigurationError(
                        f"{topic} decoder at {index} : {error.message}"
                    )
            ontology[topic] = compiled
        ontology[topic] = clean_json(ontology[topic])

    def compile_decoder(
        self, value: dict, index: int, default_decoder: dict, default_barcode: dict
    ) -> dict:
        if not isinstance(value, dict):
            return value
        value["index"] = index
        value = merge_json(default_decoder, value)
        value = clean_json(value) or {}

        default_codec_barcode = project_json(default_barcode, value) or {}

        if "undetermined" in value and value["undetermined"] is not None:
            value["undetermined"] = merge_json(
                default_codec_barcode, value["undetermined"]
            )
        else:
            value["undetermined"] = _deep_copy(default_codec_barcode)

        self.compile_decoder_transformation(value)

        barcode_index = 0
        total_concentration = 0.0
        unique_id: set[str] = set()
        noise = float(value.get("noise", 0.0))

        undetermined = value.get("undetermined")
        if undetermined is not None:
            undetermined["index"] = barcode_index
            self.infer_PU(undetermined, undetermined_tag=True)
            identifier = self.infer_ID(undetermined)
            if identifier is not None:
                unique_id.add(identifier)
            undetermined["concentration"] = noise
            barcode_index += 1

        codec = value.get("codec")
        if codec is not None:
            if not isinstance(codec, dict):
                raise ConfigurationError("codec element must be a dictionary")
            for key, record in codec.items():
                codec[key] = record = merge_json(default_codec_barcode, record)
                record["index"] = barcode_index
                self.infer_PU(record)
                identifier = self.infer_ID(record)
                if identifier is not None:
                    if identifier in unique_id:
                        raise ConfigurationError(f"duplicate {key} barcode")
                    unique_id.add(identifier)
                concentration = float(record.get("concentration", 1.0))
                if concentration >= 0:
                    total_concentration += concentration
                else:
                    raise ConfigurationError(
                        "barcode concentration must be a positive number"
                    )
                barcode_index += 1

                barcode = record.get("barcode")
                if barcode is not None:
                    record["BC"] = "-".join(barcode)

            nucleotide_cardinality = int(value.get("nucleotide cardinality", 0))
            value["barcode cardinality"] = barcode_index
            self.decoded_nucleotide_cardinality += barcode_index * nucleotide_cardinality

            if total_concentration > 0:
                factor = (1.0 - noise) / total_concentration
                for record in codec.values():
                    record["concentration"] = (
                        float(record.get("concentration", 1.0)) * factor
                    )
            else:
                raise ConfigurationError(
                    "total pool concentration is not a positive number"
                )

            self.compile_barcode_tolerance(value)
        return value

    def compile_barcode_tolerance(self, value: dict):
        """CodecMetric: pairwise Hamming minimum distance per segment and
        the Shannon bound (d_min - 1) / 2 (reference metric.h:87-242)."""
        segment_cardinality = int(value.get("segment cardinality", 0))
        barcode_length = value.get("barcode length", [])
        codec = value.get("codec", {})

        words_per_segment: list[set] = [set() for _ in range(segment_cardinality)]
        for key, record in codec.items():
            barcode = record.get("barcode")
            if barcode is None:
                continue
            if len(barcode) != segment_cardinality:
                raise ConfigurationError(
                    f"expected {segment_cardinality} segments but found "
                    f"{len(barcode)} in barcode {key}"
                )
            for segment_index, segment in enumerate(barcode):
                if len(segment) != barcode_length[segment_index]:
                    raise ConfigurationError(
                        f"{segment} is {len(segment)} nucleotide long but "
                        f"expecting {barcode_length[segment_index]}"
                    )
                words_per_segment[segment_index].add(segment)

        shannon_bound = []
        for segment_index in range(segment_cardinality):
            words = sorted(words_per_segment[segment_index])
            min_distance = barcode_length[segment_index]
            for i in range(len(words)):
                for j in range(i + 1, len(words)):
                    distance = sum(
                        a != b for a, b in zip(words[i], words[j])
                    )
                    min_distance = min(min_distance, distance)
            shannon_bound.append((min_distance - 1) // 2 if words else 0)
        value["shannon bound"] = shannon_bound

        tolerance = value.get("distance tolerance")
        if tolerance is not None:
            if len(tolerance) != segment_cardinality:
                raise ConfigurationError(
                    f"{len(tolerance)} distance tolerance cardinality "
                    f"inconsistant with {segment_cardinality} barcode segment "
                    "cardinality"
                )
            for i in range(segment_cardinality):
                if tolerance[i] > shannon_bound[i]:
                    raise ConfigurationError(
                        f"barcode tolerance for segment {i} is higher than "
                        f"shannon bound {shannon_bound[i]}"
                    )
        else:
            value["distance tolerance"] = list(shannon_bound)

    def infer_PU(self, container: dict, undetermined_tag: bool = False):
        if container.get("PU") is not None:
            return container["PU"]
        if undetermined_tag:
            suffix = "undetermined"
        else:
            barcode = container.get("barcode")
            suffix = "".join(barcode) if barcode else ""
        if not suffix:
            return None
        buffer = ""
        flowcell = container.get("flowcell id")
        if flowcell is not None:
            buffer = str(flowcell) + ":"
            lane = container.get("flowcell lane number")
            if lane is not None:
                buffer += str(lane) + ":"
        buffer += suffix
        container["PU"] = buffer
        return buffer

    def infer_ID(self, container: dict):
        if container.get("ID") is not None:
            return container["ID"]
        if container.get("PU") is not None:
            container["ID"] = container["PU"]
            return container["ID"]
        return None

    # --- multiplexing election -----------------------------------------------
    def find_multiplexing_decoder(self) -> dict:
        ontology = self.ontology
        candidates: list[dict] = []

        sample = ontology.get("sample")
        if isinstance(sample, dict) and sample.get("multiplexing classifier"):
            candidates.append(sample)
        for topic in ("cellular", "molecular"):
            for element in topic_elements(ontology.get(topic)):
                if element.get("multiplexing classifier"):
                    candidates.append(element)

        if candidates:
            if len(candidates) == 1:
                return candidates[0]
            raise ConfigurationError(
                "multiple multiplexing classifier candidates found"
            )

        def mentions_output(decoder: dict) -> bool:
            if "output" in decoder:
                return True
            undetermined = decoder.get("undetermined")
            if isinstance(undetermined, dict) and "output" in undetermined:
                return True
            codec = decoder.get("codec")
            if isinstance(codec, dict):
                for record in codec.values():
                    if isinstance(record, dict) and "output" in record:
                        return True
            return False

        if isinstance(sample, dict) and mentions_output(sample):
            candidates.append(sample)
        for topic in ("cellular", "molecular"):
            for element in topic_elements(ontology.get(topic)):
                if mentions_output(element):
                    candidates.append(element)

        if not candidates:
            if isinstance(sample, dict):
                sample["multiplexing classifier"] = True
                return sample
            raise InternalError("sample decoder should always exist")
        if len(candidates) == 1:
            candidates[0]["multiplexing classifier"] = True
            return candidates[0]
        raise ConfigurationError("multiple multiplexing classifier candidates found")

    def compile_multiplexing_decoder(self):
        ontology = self.ontology
        decoder = self.find_multiplexing_decoder()

        decoder_template = self.find_projection("multiplex:decoder") or {}
        barcode_template = self.find_projection("multiplex:barcode") or {}

        default_decoder = project_json(decoder_template, ontology) or {}
        default_barcode = project_json(barcode_template, ontology) or {}

        merged = merge_json(default_decoder, decoder)
        merged = clean_json(merged) or {}
        decoder.clear()
        decoder.update(merged)

        default_codec_barcode = project_json(default_barcode, decoder) or {}

        if "undetermined" in decoder and decoder["undetermined"] is not None:
            decoder["undetermined"] = merge_json(
                default_codec_barcode, decoder["undetermined"]
            )
        codec = decoder.get("codec")
        if isinstance(codec, dict):
            for key in codec:
                codec[key] = merge_json(default_codec_barcode, codec[key])

    # --- output ------------------------------------------------------------------
    def compile_output(self):
        ontology = self.ontology
        standardize_url_value_by_key("base output url", ontology, "out")
        base_output = URL(ontology.get("base output url", ""))

        standardize_url_value_by_key("report url", ontology, "out")
        relocate_url_by_key("report url", ontology, base_output)

        standardize_url_value_by_key("prior adjusted job url", ontology, "out")
        relocate_url_by_key("prior adjusted job url", ontology, base_output)

        self.compile_template()
        rule = Rule.from_ontology(
            ontology["template"]["transform"], allow_virtual=True
        )
        output_segment_cardinality = rule.output_segment_cardinality
        ontology["output segment cardinality"] = output_segment_cardinality

        input_segment_cardinality = int(ontology["input segment cardinality"])
        for token in rule.token_array:
            if token.input_segment_index >= input_segment_cardinality:
                raise ConfigurationError(
                    f"invalid input feed reference {token.input_segment_index} "
                    f"in token {token.index}"
                )

        decoder = self.find_multiplexing_decoder()

        channels: list[dict] = []
        if isinstance(decoder.get("undetermined"), dict):
            channels.append(decoder["undetermined"])
        if isinstance(decoder.get("codec"), dict):
            channels.extend(decoder["codec"].values())

        standardize_url_value_by_key("base output url", decoder, "out")
        base = URL(decoder.get("base output url", ""))

        default_format = ontology.get("default output format", "sam")
        default_compression = ontology.get("default output compression", "unknown")
        default_level = ontology.get("default output compression level", "5")

        canonical_by_path: dict[str, URL] = {}
        for element in channels:
            standardize_url_array_by_key("output", element, "out")
            relocate_url_array_by_key("output", element, base)
            for encoded in element.get("output", []):
                url = URL(encoded)
                if url.path not in canonical_by_path:
                    canonical_by_path[url.path] = url
                else:
                    canonical_by_path[url.path].override_query(url)

        for url in canonical_by_path.values():
            if url.is_stdin():
                raise ConfigurationError(
                    "output stream can not be set to standard input"
                )
            if url.is_stderr():
                raise ConfigurationError(
                    "output stream can not be set to standard error"
                )
            if url.format_type is None:
                url.set_type(default_format)
            if url.explicit_compression is None:
                url.set_compression(
                    None if default_compression == "unknown" else default_compression
                )
            if url.compression_level is None:
                url.set_compression_level(
                    None if default_level == "unknown" else default_level
                )

        feed_resolution: dict[str, dict[int, int]] = {}
        feed_order: list[str] = []
        for element in channels:
            if "output" in element:
                element["output"] = [
                    canonical_by_path[URL(encoded).path].encoded
                    for encoded in element["output"]
                ]
            index = int(element.get("index", 0))
            element["TC"] = output_segment_cardinality
            self._pad_url_array("output", element, output_segment_cardinality)
            for encoded in element.get("output", []):
                if encoded not in feed_resolution:
                    feed_resolution[encoded] = {}
                    feed_order.append(encoded)
                feed_resolution[encoded][index] = (
                    feed_resolution[encoded].get(index, 0) + 1
                )

        if feed_resolution:
            proxies = []
            for feed_index, encoded in enumerate(feed_order):
                by_channel = feed_resolution[encoded]
                resolution = 0
                for count in by_channel.values():
                    if resolution == 0:
                        resolution = count
                    elif resolution != count:
                        raise ConfigurationError(
                            f"inconsistent resolution for {URL(encoded).path}"
                        )
                proxies.append(
                    {
                        "index": feed_index,
                        "url": encoded,
                        "direction": "out",
                        "platform": ontology.get("platform", "ILLUMINA"),
                        "capacity": int(ontology.get("buffer capacity", 2048))
                        * resolution,
                        "resolution": resolution,
                        "phred offset": ontology.get("output phred offset", 33),
                    }
                )
            ontology["feed"]["output feed"] = proxies
        self.cross_validate_io()

    def compile_template(self):
        ontology = self.ontology
        template = ontology.setdefault("template", {})
        transform = template.setdefault("transform", {})
        input_segment_cardinality = int(ontology["input segment cardinality"])
        if "token" not in transform:
            transform["token"] = [
                f"{i}::" for i in range(input_segment_cardinality)
            ]
        self.compile_transformation(template)

    def _pad_url_array(self, key: str, container: dict, cardinality: int):
        array = container.get(key)
        if array:
            if len(array) != cardinality:
                if len(array) == 1:
                    container[key] = array * cardinality
                else:
                    raise ConfigurationError(
                        "incorrect number of output URLs in channel"
                    )

    def cross_validate_io(self):
        ontology = self.ontology
        input_urls = {
            URL(p["url"]).encoded for p in ontology["feed"].get("input feed", [])
        }
        output_urls = {
            URL(p["url"]).encoded for p in ontology["feed"].get("output feed", [])
        }
        report_url = URL(ontology.get("report url", "/dev/stderr"))
        if not report_url.is_dev_null():
            if report_url.encoded in input_urls:
                raise ConfigurationError(
                    f"URL {report_url} can not be used for both input and report"
                )
            if report_url.encoded in output_urls:
                raise ConfigurationError(
                    f"URL {report_url} can not be used for both output and report"
                )
        for encoded in output_urls:
            if encoded in input_urls:
                raise ConfigurationError(
                    f"URL {URL(encoded).path} is used for both input and output"
                )

    # --- thread model ----------------------------------------------------------
    def compile_thread_model(self):
        ontology = self.ontology
        total_threads = int(ontology.get("threads", 1))
        if "decoding threads" not in ontology:
            decoding = int(
                _cpp_round(
                    float(total_threads)
                    * (float(self.decoded_nucleotide_cardinality) / 1000.0)
                )
            )
            ontology["decoding threads"] = max(1, min(total_threads, max(1, decoding)))

    # --- validation --------------------------------------------------------------
    def validate(self):
        ontology = self.ontology
        for key in ("input phred offset", "output phred offset"):
            offset = ontology.get(key)
            if offset is not None and not (2 <= int(offset) <= 104):
                raise ConfigurationError(f"{key} out of range {offset}")
        for topic in TOPICS:
            node = ontology.get(topic)
            decoders = (
                [node]
                if isinstance(node, dict)
                else node if isinstance(node, list) else []
            )
            for decoder in decoders:
                if not isinstance(decoder, dict) or "codec" not in decoder:
                    continue
                threshold = decoder.get("confidence threshold")
                if threshold is not None and not (0 <= float(threshold) <= 1):
                    raise ConfigurationError(
                        f"confidence threshold value {threshold} not between 0 and 1"
                    )
                noise = decoder.get("noise")
                if noise is not None and not (0 <= float(noise) <= 1):
                    raise ConfigurationError(
                        f"noise value {noise} not between 0 and 1"
                    )
                corrected = decoder.get("corrected quality")
                if corrected is not None and not (2 <= int(corrected) <= 104):
                    raise ConfigurationError(
                        f"corrected quality value {corrected} not between 2 and 104"
                    )


def _cpp_round(value: float) -> float:
    """C round(): halfway cases away from zero (Python round is banker's)."""
    return math.floor(value + 0.5) if value >= 0 else math.ceil(value - 0.5)


def _deep_copy(value):
    if isinstance(value, dict):
        return {k: _deep_copy(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_deep_copy(v) for v in value]
    return value


def write_compiled_instruction(ontology: dict, precision: int = 15) -> str:
    """The `--compile` output document (reference job.cpp:91-99)."""
    from .jsonkit import write_json

    compiled = _deep_copy(ontology)
    for key in ("application version", "program", "working directory"):
        compiled.pop(key, None)
    if isinstance(compiled.get("feed"), dict):
        # engine-internal sensing marker, not part of the reference's
        # compiled document (byte-parity with test/BDGGG/valid/compile_*)
        compiled["feed"].pop("sensed", None)
    compiled = sort_json(compiled)
    return write_json(compiled, precision)
