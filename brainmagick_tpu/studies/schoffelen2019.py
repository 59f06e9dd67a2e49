"""Schoffelen2019 ("MOUS") MEG study adapter — 273ch CTF @1200Hz, 96
audio + 99 visual Dutch subjects.

Reference parity: bm/studies/schoffelen2019/{schoffelen2019,preproc,
paths}.py. The event pipeline reproduces the reference end to end:

  1. parse the Presentation .log (two tab-separated blocks joined on
     Picture/Sound/Nothing rows, times in 1e-4 s),
  2. relabel conditions (ZINNEN->sentence, WOORDEN->word_list, FIX->fix,
     ...), annotate context/blocks, extract words from Code,
  3. audio runs: attach wav filepaths from "Start File" rows and expand
     each audio onset with the word/phoneme tiers of its forced-aligned
     TextGrid (EQ_Ramp_Int2_Int1LPF%03d.TextGrid),
  4. add word_sequence / word_index per fixation-delimited trial and the
     global sequence uid from stimuli.txt (45-char-prefix match),
  5. align log time to MEG time with Levenshtein matching of fixation
     events against stim-channel triggers (fix=20, context=10) plus a
     Spearman r>0.9999 sanity check,
  6. keep word/phoneme/sound rows and create `sentence_or_sound` blocks.

Raw CTF .ds reading requires a CTF reader (the reference delegates to
MNE); `read_raw` accepts a `.npz` test stand-in so the full pipeline is
testable without CTF data (the reference plays the same trick with a
.fif posing as a .ds, bm/studies/schoffelen2019/schoffelen2019.py:27-34).
"""

from __future__ import annotations

import itertools
import logging
import typing as tp
from pathlib import Path

import numpy as np
import pandas as pd

from ..phonemes import ph_dict
from ..textgrid import read_textgrid
from . import api, utils
from .utils import match_list

logger = logging.getLogger(__name__)

RAW_SAMPLE_RATE = 1200


# ---------------------------------------------------------------------------
# Paths
# ---------------------------------------------------------------------------

class StudyPaths:
    """Resolves per-recording files in the Donders layout
    (bm/studies/schoffelen2019/paths.py)."""

    TEST_FILENAMES = ("testmeg-raw.npz", "testmeg-raw.fif")

    def __init__(self, subject_uid: str) -> None:
        self._subject_uid = subject_uid

    @classmethod
    def create(cls, subject_uid: str) -> "StudyPaths":
        return cls(subject_uid)  # separate hook for mocking

    @staticmethod
    def dataset() -> Path:
        return utils.StudyPaths("schoffelen2019").download

    @property
    def raw(self) -> Path:
        meg_folder = self.dataset() / self._subject_uid / "meg"
        for name in self.TEST_FILENAMES:
            test_file = meg_folder / name
            if test_file.exists():
                return test_file
        # FIF-converted recordings take precedence over raw CTF
        fif_files = [p for p in meg_folder.glob("*.fif")
                     if "rest" not in p.name]
        if fif_files:
            return sorted(fif_files)[-1]
        meg_files = [p for p in meg_folder.glob("*.ds")
                     if "rest" not in p.name]
        if not meg_files:
            raise RuntimeError(f"No MEG file for {self._subject_uid} "
                               f"in {meg_folder}")
        return sorted(meg_files)[-1]

    @property
    def metadata(self) -> Path:
        folder = self.dataset() / "sourcedata" / "meg_task"
        logs = sorted(folder.glob(f"*{self._subject_uid[4:]}*.log"))
        if not logs:
            raise RuntimeError(f"No Presentation log for "
                               f"{self._subject_uid} in {folder}")
        return logs[-1]

    @staticmethod
    def wave_file(name: str) -> Path:
        return StudyPaths.dataset() / "stimuli" / "audio_files" / name

    @staticmethod
    def phoneme_file(sequence_id: int) -> Path:
        return (StudyPaths.dataset() / "derivatives" / "textgrids"
                / ("EQ_Ramp_Int2_Int1LPF%.3i.TextGrid" % sequence_id))

    @staticmethod
    def stimuli_file() -> Path:
        return StudyPaths.dataset() / "stimuli" / "stimuli.txt"


# ---------------------------------------------------------------------------
# Presentation-log parsing
# ---------------------------------------------------------------------------

def _seconds_if_time(key: str, val: str) -> tp.Any:
    """Presentation logs times are integers in 1e-4 s units."""
    if val.isnumeric() and any(z in key.lower() for z in ("time", "dur")):
        return float(val) / 1e4
    return val


def _process_log_block(block: str) -> tp.List[tp.Dict[str, tp.Any]]:
    """One tab-separated block; the header line contains 'Uncertainty'
    twice (time/duration) and must be disambiguated."""
    lines = block.split("\n")
    iterlines = enumerate(lines)
    ind, line = next(iterlines)
    while "Uncertainty" not in line:
        ind, line = next(iterlines)
    headers = [x.replace(" ", "_") for x in line.split("\t")]
    replacements = iter(["time_uncertainty", "duration_uncertainty"])
    for k, name in enumerate(headers):
        if name == "Uncertainty":
            headers[k] = next(replacements)
    data = []
    for line in lines[ind + 1:]:
        if not line:
            continue
        row = dict(zip(headers, line.split("\t")))
        data.append({k: _seconds_if_time(k, v) for k, v in row.items()})
    return data


def parse_log(log_fname: tp.Union[str, Path]) -> pd.DataFrame:
    """Join the two log blocks on Picture/Sound/Nothing rows
    (bm/studies/schoffelen2019/preproc.py:59-86)."""
    text = Path(log_fname).read_text()
    text = text.replace(".\n", ".")  # broken line wraps
    text = text.split("Scenario -")[1]  # drop duplicated prefix logs
    data1, data2 = [_process_log_block(b) for b in text.split("\n\n\n")]
    df1 = pd.DataFrame(data1)
    common = ("Picture", "Sound", "Nothing")
    sel = df1["Event_Type"].isin(common)
    index = df1.loc[sel].index
    df2 = pd.DataFrame(data2, index=index)
    for key in np.intersect1d(df1.keys(), df2.keys()):
        assert (df1.loc[index, key] == df2[key].fillna("")).all()
        df2.pop(key)
    return pd.concat((df1, df2), axis=1)


_CONDITION_CODES = dict(ZINNEN="sentence", WOORDEN="word_list", FIX="fix",
                        QUESTION="question", Response="response",
                        ISI="isi", blank="blank")


def clean_log(log: pd.DataFrame) -> pd.DataFrame:
    """Condition labels, context blocks, word extraction
    (preproc.py:89-136)."""
    for key, value in _CONDITION_CODES.items():
        sel = log.Code.astype(str).str.contains(key)
        log.loc[sel, "condition"] = value
    log.loc[log.Code == "", "condition"] = "blank"

    # annotate each trial with its context (sentence vs word_list)
    start, block, context = 0, 0, "init"
    log["new_context"] = False
    for row in log.query('condition in ("word_list", "sentence")'
                         ).itertuples():
        idx = row.Index
        log.loc[start:idx, "context"] = context
        log.loc[start:idx, "block"] = block
        log.loc[idx, "new_context"] = True
        context = row.condition
        block += 1
        start = idx
    log.loc[start:, "context"] = context
    log.loc[start:, "block"] = block

    log.loc[:, "Time"] = [0.0 if not isinstance(x, (int, float)) else x
                          for x in log.Time]

    log.loc[log.condition.isna(), "condition"] = "word"
    idx = log.condition == "word"
    words = log.Code.astype(str).str.strip("0123456789 ")
    log.loc[idx, "word"] = words.loc[idx]
    sel = log.query('word=="" and condition=="word"').index
    log.loc[sel, "word"] = np.nan
    log.loc[log.word.isna() & (log.condition == "word"),
            "condition"] = "blank"
    log.loc[log.Code == "pause", "condition"] = "pause"
    log.columns = log.columns.str.lower()
    log.loc[log.word == "PULSE MODE", "condition"] = "pulse"
    return log


def add_sound_events(log: pd.DataFrame) -> pd.DataFrame:
    """Wav filepaths from 'Start File' rows; onset row becomes the sound
    event (preproc.py:154-170)."""
    sel = log["event_type"] == "Sound"
    log.loc[sel, "filepath"] = log.loc[sel, "code"].apply(
        lambda s: str(StudyPaths.wave_file(s.split("Start File ")[1])))
    onset = log.query("event_type == 'Sound'").index
    log.loc[onset + 1, "filepath"] = log.loc[onset, "filepath"].values
    log.loc[onset, "condition"] = "sound_legacy"
    log.loc[onset + 1, "condition"] = "sound"
    return log


def tgrid_to_dict(fname: tp.Union[str, Path]) -> tp.List[tp.Dict[str, tp.Any]]:
    """TextGrid -> ordered word+phoneme rows with word attribution
    (preproc.py:219-269). Words are the ORT-MAU tier, phonemes MAU."""
    parts: tp.Dict[str, tp.List] = {}
    for p in read_textgrid(fname):
        if p.name not in ("", "<p:>"):
            parts.setdefault(p.tier, []).append(p)
    words = parts["ORT-MAU"]
    phonemes = parts["MAU"]
    rows: tp.List[tp.Dict[str, tp.Any]] = []
    for word_index, word in enumerate(words):
        rows.append(dict(event_type="word", start=word.start, stop=word.stop,
                         word_index=word_index, word=word.name,
                         modality="audio"))
    starts = np.array([r["start"] for r in rows])
    for phoneme in phonemes:
        assert phoneme.name in ph_dict, \
            f"{phoneme.name} not in phoneme inventory"
        idx = np.where(phoneme.start < starts)[0]
        idx = idx[0] - 1 if idx.size else len(rows) - 1
        row = rows[idx]
        rows.append(dict(event_type="phoneme", start=phoneme.start + 1e-6,
                         stop=phoneme.stop, word_index=row["word_index"],
                         word=row["word"], phoneme=phoneme.name,
                         phoneme_id=ph_dict[phoneme.name],
                         modality="audio"))
    rows.sort(key=lambda r: float(r["start"]))
    return rows


def add_phonemes(log: pd.DataFrame,
                 phonemes_path: tp.Optional[Path] = None) -> pd.DataFrame:
    """Expand each audio onset with its TextGrid word/phoneme timing
    (preproc.py:272-332)."""
    if phonemes_path is None:
        phonemes_path = StudyPaths.phoneme_file(0).parent

    # propagate the audio-file id (sequence_id) over each file's rows
    log["sequence_id"] = np.nan
    file_: tp.Any = np.nan
    prev_start = prev_stop = 0
    starts = np.where(log.word.apply(
        lambda x: "Start File" in str(x)))[0]
    stops = np.where(log.word.apply(
        lambda x: "End of file" in str(x)))[0]
    assert len(starts) == len(stops)
    for start, stop in zip(starts, stops):
        log.loc[slice(prev_start, prev_stop), "sequence_id"] = file_
        file_ = int(str(log.loc[start, "word"]).split()[-1][:-4])
        prev_start, prev_stop = start, stop
    log.loc[slice(prev_start, prev_stop), "sequence_id"] = file_

    rows: tp.List[tp.Dict[str, tp.Any]] = []
    for start in np.where(log.word == "Audio onset")[0]:
        row = log.loc[start, :]
        if row.condition != "sound":
            raise RuntimeError(f"Unexpected condition {row.condition}")
        fname = (Path(phonemes_path)
                 / ("EQ_Ramp_Int2_Int1LPF%.3i.TextGrid" % row.sequence_id))
        content = tgrid_to_dict(fname)
        for d in content:
            d.update(subject=row.get("subject"), trial=row.get("trial"),
                     stim_type="sound", context=row.context,
                     block=row.block, sequence_id=row.sequence_id,
                     duration=d["stop"] - d["start"],
                     filepath=row.filepath,
                     time=row.time + d["start"])
        log.loc[start, "start"] = 0
        duration = content[-1]["stop"]
        log.loc[start, "stop"] = duration
        log.loc[start, "duration"] = duration
        rows.extend(content)
    log = pd.concat([log, pd.DataFrame(rows)], ignore_index=True,
                    sort=False)
    for condition in ("word", "phoneme"):
        idx = log.query("event_type == @condition").index
        log.loc[idx, "condition"] = condition
    log.loc[log.query('word=="End of file"').index, "condition"] = "end"
    idx = log.query('event_type=="Nothing" and condition=="word"').index
    log.loc[idx, "condition"] = "nothing"
    return log.sort_values("time")


def add_word_sequence_and_position(log: pd.DataFrame) -> pd.DataFrame:
    """word_sequence / word_index per fixation-delimited trial
    (preproc.py:139-151)."""
    indices = log.loc[log.condition == "fix"].index.tolist()
    for ind1, ind2 in zip(indices, indices[1:] + [log.index[-1]]):
        sub = log.loc[ind1:ind2, :]
        is_word = sub.condition == "word"
        sequence = " ".join(str(w) for w in sub.loc[is_word, "word"])
        if sequence:
            log.loc[ind1:ind2, "word_sequence"] = sequence
            log.loc[ind1:ind2, "word_index"] = np.maximum(
                0, np.cumsum(is_word) - 1)
    return log


def add_sequence_uid(log: pd.DataFrame) -> pd.DataFrame:
    """Stable sentence uid from stimuli.txt (45-char-prefix lookup —
    some trials miss the last word; preproc.py:173-202)."""
    max_char = 45
    sequence_uids: tp.Dict[str, int] = {}
    with open(StudyPaths.stimuli_file()) as f:
        for line in f.readlines():
            idx = line.find(" ")
            uid = int(line[:idx])
            sequence = line[idx + 1:].replace("\n", "")[:max_char].lower()
            assert sequence not in sequence_uids
            assert uid != 0, "uid should not be 0"
            sequence_uids[sequence] = uid

    def _map(sequence: tp.Any) -> tp.Optional[int]:
        if not isinstance(sequence, str):
            return None
        key = sequence[:max_char].lower()
        assert key in sequence_uids, key
        return sequence_uids[key]

    sequence_uid = log.word_sequence.map(_map)
    first_idx = int(sequence_uid.isna().argmin())
    assert not sequence_uid.iloc[first_idx:].isna().any(), \
        "NaNs should be only at start"
    sequence_uid.iloc[:first_idx] = sequence_uid.iloc[first_idx]
    log["sequence_uid"] = sequence_uid
    return log


def read_log(log_fname: tp.Union[str, Path]) -> pd.DataFrame:
    """Full log pipeline (preproc.py:335-354)."""
    log = parse_log(log_fname)
    log = clean_log(log)
    name = str(log_fname)
    if "MEG-MOUS-Aud" in name:
        log = add_sound_events(log)
        log = add_phonemes(log)
    elif "MEG-MOUS-Vis" in name:
        words = log.query('condition == "word"')
        log.loc[words.index, "modality"] = "visual"
    else:
        raise ValueError(f"Unknown log type: {log_fname}")
    log = add_word_sequence_and_position(log)
    log = add_sequence_uid(log)
    assert len(log)
    return log


def get_log_times(log: pd.DataFrame, events: np.ndarray,
                  sfreq: float) -> pd.DataFrame:
    """Align log clock to the MEG clock using fixation/context triggers:
    Levenshtein match + Spearman r>0.9999 sanity assert, then piecewise
    linear re-anchoring of in-between rows (preproc.py:357-430).

    events: [N, 3] (sample, _, trigger_code) with fix=20, context=10.
    """
    from scipy.stats import spearmanr

    last_sample = events[-1, 0]
    sel = np.sort(np.r_[np.where(events[:, 2] == 20)[0],
                        np.where(events[:, 2] == 10)[0]])
    common_megs = events[sel]
    common_logs = log.query('(new_context == True) or condition=="fix"')

    fix_logs = common_logs.code.str.contains("FIX")
    fix_megs = common_megs[:, 2] == 20
    if len(fix_megs) < 40 or len(fix_logs) < 40:
        logger.warning("match_list may be based on too few elements")
    assert len(fix_megs) > 1 and len(fix_logs) > 1
    idx_logs, idx_megs = match_list(fix_logs.tolist(), fix_megs.tolist())

    time_logs = common_logs.iloc[idx_logs].time
    time_meg = common_megs[idx_megs, 0] / sfreq
    r, _ = spearmanr(time_logs, time_meg)
    assert r > 0.9999, f"log/MEG trigger correlation too low: {r}"
    common_megs = common_megs[idx_megs]
    common_logs = common_logs.iloc[idx_logs]

    last_log = common_logs.time.values[0]
    last_meg = common_megs[0, 0]
    last_idx = 0
    for common_meg, common_log in zip(common_megs,
                                      common_logs.itertuples()):
        idx = common_log.Index
        if common_meg[2] == 20:
            assert common_log.condition == "fix"
        else:
            assert common_log.condition in ("sentence", "word_list")
        log.loc[idx, "meg_time"] = common_meg[0] / sfreq
        sel2 = slice(last_idx + 1, idx)
        times = log.loc[sel2, "time"] - last_log + last_meg / sfreq
        assert np.all(np.isfinite(times.astype(float)))
        log.loc[sel2, "meg_time"] = times
        last_log = common_log.time
        last_meg = common_meg[0]
        last_idx = idx

    sel2 = slice(last_idx + 1, None)
    log.loc[sel2, "meg_time"] = (log.loc[sel2, "time"] - last_log
                                 + last_meg / sfreq)
    log.meg_time = log.meg_time.fillna(-1)
    log["meg_sample"] = np.array(log.meg_time.values * sfreq, int)
    n_out = int((log.meg_sample > last_sample).sum()
                + (log.meg_sample < 0).sum())
    if n_out:
        logger.warning("%d events outside the MEG recording removed", n_out)
    return log.query(f"meg_sample<={last_sample} and meg_sample>=0")


# ---------------------------------------------------------------------------
# Raw reading
# ---------------------------------------------------------------------------

def read_raw(raw_fname: tp.Union[str, Path]
             ) -> tp.Tuple[api.RawData, np.ndarray]:
    """Returns (RawData, trigger events [N, 3]).

    CTF .ds needs a native reader (planned; the reference uses MNE's).
    `.npz` stand-ins (keys: data [C,T], sample_rate, positions, events)
    support pipeline testing, mirroring the reference's fif-as-ds hack.
    """
    raw_fname = str(raw_fname)
    if raw_fname.endswith(".npz"):
        payload = np.load(raw_fname, allow_pickle=False)
        raw = api.RawData(
            data=payload["data"].astype(np.float32),
            sample_rate=float(payload["sample_rate"]),
            ch_names=[f"c{k}" for k in range(payload["data"].shape[0])],
            positions=payload["positions"].astype(np.float32))
        return raw, payload["events"].astype(np.int64)
    if raw_fname.endswith(".fif"):
        # FIF-converted MOUS recording: split the stim channel for
        # triggers, keep the MEG channels (reference picks 273 data
        # channels after the 28 reference sensors,
        # bm/studies/schoffelen2019/schoffelen2019.py:142-147)
        from .io import FIFFV_MEG_CH, FIFFV_STIM_CH, find_events, read_fif
        full = read_fif(raw_fname)
        kinds = np.asarray(full.ch_kinds or [FIFFV_MEG_CH] * full.n_channels)
        stim_idx = np.flatnonzero(kinds == FIFFV_STIM_CH)
        events = (find_events(full.data[stim_idx[0]])
                  if len(stim_idx) else np.zeros((0, 3), dtype=np.int64))
        meg_idx = np.flatnonzero(kinds == FIFFV_MEG_CH)
        if len(meg_idx) > 273 + 28:
            meg_idx = meg_idx[28:28 + 273]
        raw = api.RawData(
            data=np.ascontiguousarray(full.data[meg_idx]),
            sample_rate=full.sample_rate,
            ch_names=[full.ch_names[i] for i in meg_idx],
            positions=full.positions[meg_idx])
        return raw, events
    if raw_fname.endswith(".ds"):
        # native CTF read (studies/ctf.py): triggers come from the UPPT
        # stim channel; MEG picks are the 273 head sensors directly
        # (sensor type 5), no reference-channel offset needed
        from .io import FIFFV_MEG_CH, FIFFV_STIM_CH, find_events
        from .ctf import read_ctf
        full = read_ctf(Path(raw_fname))
        kinds = np.asarray(full.ch_kinds)
        stim_idx = np.flatnonzero(kinds == FIFFV_STIM_CH)
        events = (find_events(full.data[stim_idx[0]])
                  if len(stim_idx) else np.zeros((0, 3), dtype=np.int64))
        meg_idx = np.flatnonzero(kinds == FIFFV_MEG_CH)[:273]
        raw = api.RawData(
            data=np.ascontiguousarray(full.data[meg_idx]),
            sample_rate=full.sample_rate,
            ch_names=[full.ch_names[i] for i in meg_idx],
            positions=full.positions[meg_idx])
        return raw, events
    raise ValueError(f"Unknown raw format: {raw_fname}")


# subjects excluded by the reference (2-run recordings / missing data,
# bm/studies/schoffelen2019/schoffelen2019.py:104-111)
BAD_NUMS = [2011, 2036, 2062, 2063, 2076, 2084, 1006, 1014, 1090, 1115]
NO_SUBJECT = [1014, 1018, 1021, 1023, 1041, 1043, 1047, 1051, 1056, 1060,
              1067, 1082, 1091, 1096, 1112, 2012, 2018, 2022, 2023, 2026,
              2043, 2044, 2045, 2048, 2054, 2060, 2074, 2081, 2082, 2087,
              2093, 2100, 2107, 2112, 2115, 2118, 2123]


class Schoffelen2019Recording(api.Recording):

    data_url = "https://data.donders.ru.nl/collections/di/dccn/DSC_3011020.09_236_v1"
    paper_url = "https://www.nature.com/articles/s41597-019-0020-y"
    doi = "https://doi.org/10.1038/s41597-019-0020-y"
    licence = "Donders"
    modality = "all"
    language = "nl"
    device = "meg"
    description = "204 subjects listened or read context-less sentences."

    @classmethod
    def iter(cls, events_filter: tp.Optional[str] = None,  # type: ignore[override]
             modality: str = "all"
             ) -> tp.Iterator["Schoffelen2019Recording"]:
        if modality not in ("visual", "audio", "all"):
            raise ValueError(f"Unknown modality: {modality}")
        try:
            study_paths = utils.StudyPaths("schoffelen2019")
        except EnvironmentError:
            return
        if not study_paths.download.exists():
            # mirror the Donders collection on first use (reference
            # _prepare, bm/studies/schoffelen2019/schoffelen2019.py:37-55)
            from . import download as dl
            parent, study = cls.data_url.rstrip("/").split("/")[-2:]
            try:
                dl.download_donders(study, study_paths.path, parent=parent)
            except dl.DownloadError as e:
                logger.warning("schoffelen2019 auto-download skipped: %s",
                               e)
        for num in itertools.chain(range(1001, 1118), range(2002, 2126)):
            if num in BAD_NUMS + NO_SUBJECT:
                continue
            subject_uid = f"sub-{'V' if num < 2000 else 'A'}{num}"
            recording = cls(subject_uid, events_filter)
            if not recording.paths_valid():
                continue
            if recording.modality == modality or modality == "all":
                yield recording

    def __init__(self, subject_uid: str,
                 events_filter: tp.Optional[str] = None) -> None:
        super().__init__(subject_uid=subject_uid, recording_uid=subject_uid)
        num = int(subject_uid[-4:])
        self.modality = "visual" if num < 2000 else "audio"
        assert subject_uid == f"sub-{self.modality[0].upper()}{num}"
        self.paths = StudyPaths.create(subject_uid)
        self._events_filter = events_filter

    def paths_valid(self) -> bool:
        try:
            _ = self.paths.raw
            _ = self.paths.metadata
        except RuntimeError:
            return False
        return True

    def _load_raw(self) -> api.RawData:
        raw, _ = read_raw(self.paths.raw)
        if raw.sample_rate != RAW_SAMPLE_RATE:
            raise RuntimeError("Raw has an unexpected sample rate")
        return raw

    def _load_events(self) -> pd.DataFrame:
        raw, trigger_events = read_raw(self.paths.raw)
        metadata = read_log(self.paths.metadata)
        metadata = get_log_times(metadata, trigger_events, raw.sample_rate)
        metadata = metadata.rename(columns=dict(
            start="offset", meg_time="start", stop="legacy_stop",
            condition="kind"))
        events_df = metadata.drop(
            columns=[c for c in metadata.columns if c.startswith("legacy_")])
        cols = ["start", "duration", "kind", "context", "word", "filepath",
                "sequence_id", "word_index", "phoneme", "phoneme_id",
                "word_sequence", "sequence_uid"]
        if "offset" in events_df.columns:
            cols.append("offset")
        cols = [c for c in cols if c in events_df.columns]
        events_df = events_df.loc[
            events_df.kind.isin(["word", "phoneme", "sound"]), cols]
        # expose the sentence/word_list context as `condition` so the
        # word-list selections (events_filter: condition == "word_list")
        # and the block-uid fallback keep working after the rename
        events_df["condition"] = events_df["context"]
        events_df[["language", "modality"]] = self.language, self.modality
        events_df = events_df.event.create_blocks(groupby="sentence_or_sound")
        return events_df

    def events(self, clean: bool = False) -> pd.DataFrame:
        events = super().events(clean)
        if clean and self._events_filter is not None:
            events = events.query(self._events_filter)
        return events
