# One-shot catalog generator for the round-4 language additions
# (fr, de, pt_BR, zh_CN — the reference's ALL_LINGUAS beyond it/ru/es,
# /root/reference/configure.ac:91). Run once; kept for regeneration.
import json
import os

T = {
 "--delta-x {v} out of range 0..{hi}": [
  "--delta-x {v} hors de l'intervalle 0..{hi}",
  "--delta-x {v} außerhalb des Bereichs 0..{hi}",
  "--delta-x {v} fora do intervalo 0..{hi}",
  "--delta-x {v} 超出范围 0..{hi}"],
 "--enl-step {v} out of range {lo:g}..{hi:g} (percent)": [
  "--enl-step {v} hors de l'intervalle {lo:g}..{hi:g} (pour cent)",
  "--enl-step {v} außerhalb des Bereichs {lo:g}..{hi:g} (Prozent)",
  "--enl-step {v} fora do intervalo {lo:g}..{hi:g} (por cento)",
  "--enl-step {v} 超出范围 {lo:g}..{hi:g}（百分比）"],
 "--rigidity {v} out of range 0..{hi:g}": [
  "--rigidity {v} hors de l'intervalle 0..{hi:g}",
  "--rigidity {v} außerhalb des Bereichs 0..{hi:g}",
  "--rigidity {v} fora do intervalo 0..{hi:g}",
  "--rigidity {v} 超出范围 0..{hi:g}"],
 "--seam-colors {v!r} is not 6 comma-separated floats R1,G1,B1,R2,G2,B2": [
  "--seam-colors {v!r} n'est pas composé de 6 nombres séparés par des virgules R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} besteht nicht aus 6 kommagetrennten Zahlen R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} não são 6 números separados por vírgulas R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} 不是 6 个逗号分隔的数值 R1,G1,B1,R2,G2,B2"],
 "--{name} {v} out of range 0..{hi}": [
  "--{name} {v} hors de l'intervalle 0..{hi}",
  "--{name} {v} außerhalb des Bereichs 0..{hi}",
  "--{name} {v} fora do intervalo 0..{hi}",
  "--{name} {v} 超出范围 0..{hi}"],
 "BatchCarver needs at least one image": [
  "BatchCarver requiert au moins une image",
  "BatchCarver benötigt mindestens ein Bild",
  "BatchCarver precisa de pelo menos uma imagem",
  "BatchCarver 至少需要一张图像"],
 "Resizing height...": [
  "Redimensionnement de la hauteur...",
  "Höhe wird skaliert...",
  "Redimensionando a altura...",
  "正在调整高度..."],
 "Resizing width...": [
  "Redimensionnement de la largeur...",
  "Breite wird skaliert...",
  "Redimensionando a largura...",
  "正在调整宽度..."],
 "animate: height keyframe for the last frame": [
  "animation : hauteur clé pour la dernière image",
  "Animation: Höhen-Keyframe für das letzte Bild",
  "animação: altura-chave para o último quadro",
  "动画：最后一帧的高度关键帧"],
 "animate: width keyframe for the last frame": [
  "animation : largeur clé pour la dernière image",
  "Animation: Breiten-Keyframe für das letzte Bild",
  "animação: largura-chave para o último quadro",
  "动画：最后一帧的宽度关键帧"],
 "attached aux carver is {aw}x{ah}, main image is {w}x{h}; attached carvers must match the main size": [
  "le carver auxiliaire attaché est {aw}x{ah}, l'image principale est {w}x{h} ; les carvers attachés doivent avoir la même taille",
  "der angehängte Hilfs-Carver ist {aw}x{ah}, das Hauptbild {w}x{h}; angehängte Carver müssen der Hauptgröße entsprechen",
  "o carver auxiliar anexado é {aw}x{ah}, a imagem principal é {w}x{h}; os carvers anexados devem corresponder ao tamanho principal",
  "附加的辅助雕刻器为 {aw}x{ah}，主图像为 {w}x{h}；附加雕刻器必须与主尺寸一致"],
 "aux {j} of image {i} is {aw}x{ah}, image is {w}x{h}": [
  "l'auxiliaire {j} de l'image {i} est {aw}x{ah}, l'image est {w}x{h}",
  "Hilfsebene {j} von Bild {i} ist {aw}x{ah}, das Bild ist {w}x{h}",
  "o auxiliar {j} da imagem {i} é {aw}x{ah}, a imagem é {w}x{h}",
  "图像 {i} 的辅助层 {j} 为 {aw}x{ah}，图像为 {w}x{h}"],
 "batch of {B} images cannot shard evenly over {n} 'data' devices; pad the batch to a multiple of {n}": [
  "un lot de {B} images ne se répartit pas uniformément sur {n} dispositifs 'data' ; complétez le lot jusqu'à un multiple de {n}",
  "ein Stapel von {B} Bildern lässt sich nicht gleichmäßig auf {n} 'data'-Geräte verteilen; füllen Sie den Stapel auf ein Vielfaches von {n} auf",
  "um lote de {B} imagens não pode ser dividido igualmente entre {n} dispositivos 'data'; complete o lote até um múltiplo de {n}",
  "{B} 张图像的批次无法均匀分配到 {n} 个 'data' 设备上；请将批次补齐为 {n} 的倍数"],
 "column sharding requires equal image heights (pad or batch same-height images together)": [
  "le partitionnement par colonnes exige des hauteurs d'image égales (complétez ou regroupez des images de même hauteur)",
  "Spalten-Sharding erfordert gleiche Bildhöhen (auffüllen oder Bilder gleicher Höhe zusammen stapeln)",
  "o sharding por colunas requer alturas de imagem iguais (complete ou agrupe imagens da mesma altura)",
  "按列分片要求图像高度一致（请补齐或将同高度图像归为一批）"],
 "delta_x={v} out of range 0..{hi}": [
  "delta_x={v} hors de l'intervalle 0..{hi}",
  "delta_x={v} außerhalb des Bereichs 0..{hi}",
  "delta_x={v} fora do intervalo 0..{hi}",
  "delta_x={v} 超出范围 0..{hi}"],
 "dialog reported a fatal state": [
  "la boîte de dialogue a signalé un état fatal",
  "der Dialog meldete einen fatalen Zustand",
  "o diálogo relatou um estado fatal",
  "对话框报告了致命状态"],
 "discard mask": [
  "masque de suppression",
  "Verwerfungsmaske",
  "máscara de descarte",
  "丢弃蒙版"],
 "discard mask image file": [
  "fichier image du masque de suppression",
  "Bilddatei der Verwerfungsmaske",
  "arquivo de imagem da máscara de descarte",
  "丢弃蒙版图像文件"],
 "do NOT ignore the discard mask when enlarging": [
  "ne PAS ignorer le masque de suppression lors de l'agrandissement",
  "die Verwerfungsmaske beim Vergrößern NICHT ignorieren",
  "NÃO ignorar a máscara de descarte ao ampliar",
  "放大时不要忽略丢弃蒙版"],
 "done in {seconds:.2f}s": [
  "terminé en {seconds:.2f}s",
  "fertig in {seconds:.2f}s",
  "concluído em {seconds:.2f}s",
  "完成，用时 {seconds:.2f} 秒"],
 "enl_step={v} out of range [{lo}, {hi}] (100.1%-200%)": [
  "enl_step={v} hors de l'intervalle [{lo}, {hi}] (100,1%-200%)",
  "enl_step={v} außerhalb des Bereichs [{lo}, {hi}] (100,1%-200%)",
  "enl_step={v} fora do intervalo [{lo}, {hi}] (100,1%-200%)",
  "enl_step={v} 超出范围 [{lo}, {hi}]（100.1%-200%）"],
 "error": [
  "erreur", "Fehler", "erro", "错误"],
 "every image must attach the same number of aux carvers": [
  "chaque image doit attacher le même nombre de carvers auxiliaires",
  "jedes Bild muss dieselbe Anzahl von Hilfs-Carvern anhängen",
  "cada imagem deve anexar o mesmo número de carvers auxiliares",
  "每张图像必须附加相同数量的辅助雕刻器"],
 "final height: pixels or percent (optional with --last)": [
  "hauteur finale : pixels ou pourcentage (facultatif avec --last)",
  "Endhöhe: Pixel oder Prozent (optional mit --last)",
  "altura final: pixels ou porcentagem (opcional com --last)",
  "最终高度：像素或百分比（使用 --last 时可省略）"],
 "final width: pixels or percent like 75%% (optional with --last)": [
  "largeur finale : pixels ou pourcentage comme 75%% (facultatif avec --last)",
  "Endbreite: Pixel oder Prozent wie 75%% (optional mit --last)",
  "largura final: pixels ou porcentagem como 75%% (opcional com --last)",
  "最终宽度：像素或百分比（如 75%%，使用 --last 时可省略）"],
 "force pure-JAX (no Pallas) path": [
  "forcer le chemin JAX pur (sans Pallas)",
  "reinen JAX-Pfad erzwingen (ohne Pallas)",
  "forçar o caminho JAX puro (sem Pallas)",
  "强制使用纯 JAX（无 Pallas）路径"],
 "g++ failed building the native reference carver ({src}):\n{err}": [
  "g++ n'a pas pu compiler le carver de référence natif ({src}) :\n{err}",
  "g++ konnte den nativen Referenz-Carver nicht bauen ({src}):\n{err}",
  "g++ falhou ao compilar o carver de referência nativo ({src}):\n{err}",
  "g++ 编译本地参考雕刻器失败（{src}）：\n{err}"],
 "height": ["hauteur", "Höhe", "altura", "高度"],
 "image changed under the interactive session (layer removed or its type changed); the session cannot continue": [
  "l'image a changé pendant la session interactive (calque supprimé ou type modifié) ; la session ne peut pas continuer",
  "das Bild hat sich während der interaktiven Sitzung geändert (Ebene entfernt oder Typ geändert); die Sitzung kann nicht fortgesetzt werden",
  "a imagem mudou durante a sessão interativa (camada removida ou tipo alterado); a sessão não pode continuar",
  "交互会话期间图像发生变化（图层被删除或类型改变）；会话无法继续"],
 "image {i} has {c} channels, batch has {C}": [
  "l'image {i} a {c} canaux, le lot en a {C}",
  "Bild {i} hat {c} Kanäle, der Stapel hat {C}",
  "a imagem {i} tem {c} canais, o lote tem {C}",
  "图像 {i} 有 {c} 个通道，批次为 {C} 个"],
 "input image file(s)": [
  "fichier(s) image d'entrée",
  "Eingabebilddatei(en)",
  "arquivo(s) de imagem de entrada",
  "输入图像文件"],
 "interactive run requires a dialog driver": [
  "l'exécution interactive requiert un pilote de dialogue",
  "der interaktive Lauf erfordert einen Dialogtreiber",
  "a execução interativa requer um driver de diálogo",
  "交互式运行需要对话框驱动"],
 "internal: dropping a map with carved seams — this is a bug; callers must flatten first": [
  "interne : abandon d'une carte avec des coutures sculptées — c'est un bogue ; il faut d'abord aplatir",
  "intern: Verwerfen einer Karte mit geschnitzten Nähten — das ist ein Fehler; zuerst muss geglättet werden",
  "interno: descartando um mapa com costuras esculpidas — isto é um bug; é preciso achatar primeiro",
  "内部错误：丢弃了包含已雕刻缝线的映射——这是一个 bug；必须先执行 flatten"],
 "layer {name!r} is not selectable as a mask (must belong to the image and not be the active layer)": [
  "le calque {name!r} n'est pas sélectionnable comme masque (il doit appartenir à l'image et ne pas être le calque actif)",
  "Ebene {name!r} ist nicht als Maske wählbar (sie muss zum Bild gehören und darf nicht die aktive Ebene sein)",
  "a camada {name!r} não pode ser selecionada como máscara (deve pertencer à imagem e não ser a camada ativa)",
  "图层 {name!r} 不能选作蒙版（必须属于该图像且不能是活动图层）"],
 "map: {axis}, reference {ref} (image {w}x{h}), depth {depth}, range [{lo}, {hi}], next step at {step}": [
  "carte : {axis}, référence {ref} (image {w}x{h}), profondeur {depth}, intervalle [{lo}, {hi}], prochaine étape à {step}",
  "Karte: {axis}, Referenz {ref} (Bild {w}x{h}), Tiefe {depth}, Bereich [{lo}, {hi}], nächster Schritt bei {step}",
  "mapa: {axis}, referência {ref} (imagem {w}x{h}), profundidade {depth}, intervalo [{lo}, {hi}], próximo passo em {step}",
  "映射：{axis}，参考 {ref}（图像 {w}x{h}），深度 {depth}，范围 [{lo}, {hi}]，下一步在 {step}"],
 "mask edit session already closed": [
  "session d'édition de masque déjà fermée",
  "Maskenbearbeitungssitzung bereits geschlossen",
  "sessão de edição de máscara já encerrada",
  "蒙版编辑会话已关闭"],
 "max enlargement per step, percent (default 150)": [
  "agrandissement maximal par étape, en pour cent (150 par défaut)",
  "maximale Vergrößerung pro Schritt, Prozent (Standard 150)",
  "ampliação máxima por passo, por cento (padrão 150)",
  "每步最大放大比例，百分比（默认 150）"],
 "no last-used size is stored": [
  "aucune taille précédemment utilisée n'est enregistrée",
  "keine zuletzt verwendete Größe gespeichert",
  "nenhum tamanho usado anteriormente está armazenado",
  "没有存储上次使用的尺寸"],
 "no such file: {path}": [
  "fichier introuvable : {path}",
  "Datei nicht gefunden: {path}",
  "arquivo não encontrado: {path}",
  "文件不存在：{path}"],
 "no {type} mask selected to edit": [
  "aucun masque {type} sélectionné à éditer",
  "keine {type}-Maske zum Bearbeiten ausgewählt",
  "nenhuma máscara {type} selecionada para editar",
  "未选择要编辑的 {type} 蒙版"],
 "noninteractive run requires a full config": [
  "l'exécution non interactive requiert une configuration complète",
  "der nicht-interaktive Lauf erfordert eine vollständige Konfiguration",
  "a execução não interativa requer uma configuração completa",
  "非交互式运行需要完整配置"],
 "offset {s!r} is not of the form X,Y (integers)": [
  "le décalage {s!r} n'est pas de la forme X,Y (entiers)",
  "Versatz {s!r} hat nicht die Form X,Y (Ganzzahlen)",
  "o deslocamento {s!r} não tem a forma X,Y (inteiros)",
  "偏移量 {s!r} 不是 X,Y（整数）形式"],
 "output directory (multiple inputs)": [
  "répertoire de sortie (entrées multiples)",
  "Ausgabeverzeichnis (mehrere Eingaben)",
  "diretório de saída (múltiplas entradas)",
  "输出目录（多个输入）"],
 "output file (single input)": [
  "fichier de sortie (entrée unique)",
  "Ausgabedatei (einzelne Eingabe)",
  "arquivo de saída (entrada única)",
  "输出文件（单个输入）"],
 "output the seam map(s)": [
  "produire les cartes de coutures",
  "die Nahtkarte(n) ausgeben",
  "gerar os mapas de costuras",
  "输出缝线映射"],
 "paint region {got} does not match mask layer {want}": [
  "la région peinte {got} ne correspond pas au calque de masque {want}",
  "der bemalte Bereich {got} passt nicht zur Maskenebene {want}",
  "a região pintada {got} não corresponde à camada de máscara {want}",
  "绘制区域 {got} 与蒙版图层 {want} 不匹配"],
 "percent sizes cannot combine with --gap-* keyframes": [
  "les tailles en pourcentage ne se combinent pas avec les images clés --gap-*",
  "Prozentgrößen lassen sich nicht mit --gap-*-Keyframes kombinieren",
  "tamanhos percentuais não podem ser combinados com quadros-chave --gap-*",
  "百分比尺寸不能与 --gap-* 关键帧同时使用"],
 "persist this run's settings for --last replay": [
  "conserver les réglages de cette exécution pour le rejeu avec --last",
  "die Einstellungen dieses Laufs für die --last-Wiedergabe speichern",
  "guardar as configurações desta execução para repetição com --last",
  "保存本次运行的设置以便用 --last 重放"],
 "preservation mask": [
  "masque de préservation",
  "Erhaltungsmaske",
  "máscara de preservação",
  "保留蒙版"],
 "preservation mask image file": [
  "fichier image du masque de préservation",
  "Bilddatei der Erhaltungsmaske",
  "arquivo de imagem da máscara de preservação",
  "保留蒙版图像文件"],
 "render failed": [
  "échec du rendu",
  "Rendern fehlgeschlagen",
  "falha na renderização",
  "渲染失败"],
 "render failed for {path}": [
  "échec du rendu pour {path}",
  "Rendern fehlgeschlagen für {path}",
  "falha na renderização de {path}",
  "渲染失败：{path}"],
 "replay the last saved settings (RUN_WITH_LAST_VALS; aux masks matched by name)": [
  "rejouer les derniers réglages enregistrés (RUN_WITH_LAST_VALS ; masques auxiliaires appariés par nom)",
  "die zuletzt gespeicherten Einstellungen wiedergeben (RUN_WITH_LAST_VALS; Hilfsmasken nach Namen zugeordnet)",
  "repetir as últimas configurações salvas (RUN_WITH_LAST_VALS; máscaras auxiliares correspondidas por nome)",
  "重放上次保存的设置（RUN_WITH_LAST_VALS；辅助蒙版按名称匹配）"],
 "rigidity mask": [
  "masque de rigidité",
  "Steifigkeitsmaske",
  "máscara de rigidez",
  "刚性蒙版"],
 "rigidity mask image file": [
  "fichier image du masque de rigidité",
  "Bilddatei der Steifigkeitsmaske",
  "arquivo de imagem da máscara de rigidez",
  "刚性蒙版图像文件"],
 "rigidity={v} must be >= 0": [
  "rigidity={v} doit être >= 0",
  "rigidity={v} muss >= 0 sein",
  "rigidity={v} deve ser >= 0",
  "rigidity={v} 必须 >= 0"],
 "settings store file (default ~/.config/lqr_tpu/settings.json)": [
  "fichier de stockage des réglages (par défaut ~/.config/lqr_tpu/settings.json)",
  "Einstellungsdatei (Standard ~/.config/lqr_tpu/settings.json)",
  "arquivo de armazenamento de configurações (padrão ~/.config/lqr_tpu/settings.json)",
  "设置存储文件（默认 ~/.config/lqr_tpu/settings.json）"],
 "size {spec!r} is neither an integer nor a percentage like '75%'": [
  "la taille {spec!r} n'est ni un entier ni un pourcentage comme '75%'",
  "Größe {spec!r} ist weder eine Ganzzahl noch ein Prozentsatz wie '75%'",
  "o tamanho {spec!r} não é nem um inteiro nem uma porcentagem como '75%'",
  "尺寸 {spec!r} 既不是整数也不是 '75%' 这样的百分比"],
 "target size {w}x{h} is invalid; both sides must be >= 1": [
  "la taille cible {w}x{h} est invalide ; les deux côtés doivent être >= 1",
  "Zielgröße {w}x{h} ist ungültig; beide Seiten müssen >= 1 sein",
  "o tamanho alvo {w}x{h} é inválido; ambos os lados devem ser >= 1",
  "目标尺寸 {w}x{h} 无效；两边都必须 >= 1"],
 "target {axis} {v} is invalid; must be >= 1": [
  "la valeur cible de {axis} {v} est invalide ; elle doit être >= 1",
  "Zielwert für {axis} {v} ist ungültig; muss >= 1 sein",
  "o valor alvo de {axis} {v} é inválido; deve ser >= 1",
  "目标{axis} {v} 无效；必须 >= 1"],
 "width": ["largeur", "Breite", "largura", "宽度"],
 "width and height are required (or use --last to replay the saved settings)": [
  "la largeur et la hauteur sont requises (ou utilisez --last pour rejouer les réglages enregistrés)",
  "Breite und Höhe sind erforderlich (oder --last zum Wiedergeben der gespeicherten Einstellungen verwenden)",
  "largura e altura são obrigatórias (ou use --last para repetir as configurações salvas)",
  "必须提供宽度和高度（或使用 --last 重放已保存的设置）"],
 "width {w} cannot shard evenly over {n} 'cols' devices": [
  "la largeur {w} ne se répartit pas uniformément sur {n} dispositifs 'cols'",
  "Breite {w} lässt sich nicht gleichmäßig auf {n} 'cols'-Geräte verteilen",
  "a largura {w} não pode ser dividida igualmente entre {n} dispositivos 'cols'",
  "宽度 {w} 无法均匀分配到 {n} 个 'cols' 设备上"],
 "{what} has {c} channels; only 1-4 (GRAY, GRAYA, RGB, RGBA) are supported": [
  "{what} a {c} canaux ; seuls 1-4 (GRAY, GRAYA, RGB, RGBA) sont pris en charge",
  "{what} hat {c} Kanäle; nur 1-4 (GRAY, GRAYA, RGB, RGBA) werden unterstützt",
  "{what} tem {c} canais; apenas 1-4 (GRAY, GRAYA, RGB, RGBA) são suportados",
  "{what} 有 {c} 个通道；仅支持 1-4 个（GRAY、GRAYA、RGB、RGBA）"],
}

LANGS = ["fr", "de", "pt_BR", "zh_CN"]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    locale = os.path.join(here, "..", "lqr_tpu", "locale")
    tpl = json.load(open(os.path.join(locale, "TEMPLATE.json"),
                         encoding="utf-8"))
    missing = set(tpl) - set(T)
    assert not missing, sorted(missing)
    for i, lang in enumerate(LANGS):
        cat = {k: v[i] for k, v in T.items() if k in tpl}
        p = os.path.join(locale, f"{lang}.json")
        with open(p, "w", encoding="utf-8") as f:
            json.dump(cat, f, indent=2, ensure_ascii=False, sort_keys=True)
            f.write("\n")
        print(lang, len(cat))


if __name__ == "__main__":
    main()
