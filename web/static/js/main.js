(function () {
  "use strict";

  var sliders = ["neu", "sad", "hap", "ang"];

  sliders.forEach(function (id) {
    var el = document.getElementById(id);
    el.addEventListener("input", function () {
      document.getElementById(id + "-val").textContent =
        parseFloat(el.value).toFixed(2);
    });
  });

  document.querySelectorAll('input[name="mode"]').forEach(function (radio) {
    radio.addEventListener("change", function () {
      var refMode = document.querySelector('input[name="mode"]:checked').value === "ref";
      document.getElementById("ratio-controls").classList.toggle("hidden", refMode);
      document.getElementById("ref-controls").classList.toggle("hidden", !refMode);
    });
  });

  document.getElementById("random-ref").addEventListener("click", function () {
    // Prefer the shipped demo refs (wavs exist in samples/refs/); fall back
    // to the dataset test manifest (paths valid only with the koemo corpus).
    fetch("/uploads/demo_refs.txt")
      .then(function (r) {
        if (!r.ok) return fetch("/uploads/koemo_spk_emo_all_test.txt")
          .then(function (r2) {
            if (!r2.ok) throw new Error("HTTP " + r2.status);
            return r2.text();
          });
        return r.text();
      })
      .then(function (txt) {
        var lines = txt.trim().split("\n");
        var line = lines[Math.floor(Math.random() * lines.length)];
        document.getElementById("ref").value = line.split("|")[0];
      })
      .catch(function () {
        document.getElementById("status").textContent = "참조 목록을 불러올 수 없습니다";
      });
  });

  document.getElementById("generate").addEventListener("click", function () {
    var text = document.getElementById("text").value.trim();
    if (!text) return;
    var status = document.getElementById("status");
    status.textContent = "합성 중…";

    var params;
    var refMode = document.querySelector('input[name="mode"]:checked').value === "ref";
    if (refMode) {
      params = new URLSearchParams({
        text: text, con: "true", ref: document.getElementById("ref").value,
      });
    } else {
      params = new URLSearchParams({
        text: text, con: "false",
        n: document.getElementById("neu").value,
        s: document.getElementById("sad").value,
        h: document.getElementById("hap").value,
        a: document.getElementById("ang").value,
      });
    }

    fetch("/generate?" + params.toString())
      .then(function (r) {
        if (!r.ok) throw new Error("HTTP " + r.status);
        return r.blob();
      })
      .then(function (blob) {
        var player = document.getElementById("player");
        player.src = URL.createObjectURL(blob);
        player.classList.remove("hidden");
        player.play();
        status.textContent = "";
      })
      .catch(function (e) {
        status.textContent = "합성 실패: " + e.message;
      });
  });
})();
